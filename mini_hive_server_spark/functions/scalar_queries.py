"""(placeholder — queries land in this round)"""
