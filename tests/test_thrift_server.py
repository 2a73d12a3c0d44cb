"""Serving-surface smoke test: boot the embedded HiveThriftServer2, then
round-trip SQL through the listening TCP endpoint from beeline's own JVM
(JDBC client) — the "Hive server" half of the BASELINE north star. Runs in
a subprocess because the thrift host session must be the JVM's first
(static hive catalog conf), and the pytest process already owns one."""

from __future__ import annotations

import subprocess
import sys

PORT = 10841

_SCRIPT = f"""
import shutil
shutil.rmtree("/tmp/mhs_thrift_it_ms", ignore_errors=True)
shutil.rmtree("/tmp/mhs_thrift_it_wh", ignore_errors=True)
shutil.rmtree("/tmp/mhs_spark_warehouse/sf0.001/mhs_serve_it", ignore_errors=True)
from mini_hive_server_spark.server import (
    _create_reference_tables, beeline_sql, get_thrift_spark, start_thrift_server,
)
from mini_hive_server_spark.catalog import create_managed_tables
spark = get_thrift_spark(port={PORT},
                         warehouse_dir="/tmp/mhs_thrift_it_wh",
                         metastore_dir="/tmp/mhs_thrift_it_ms")
spark.sparkContext.setLogLevel("ERROR")
create_managed_tables(spark, "/root/testdata/sf0.001",
                      database="mhs_serve_it", tables=("region", "nation"))
_create_reference_tables(spark, "mhs_serve_it")
start_thrift_server(spark, port={PORT})

# 1. point SELECT over the endpoint
rows = beeline_sql("SELECT r_regionkey, r_name FROM mhs_serve_it.region "
                   "ORDER BY r_regionkey", port={PORT})
assert [r[1] for r in rows] == ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"], rows

# 2. join + aggregate (a real plan, not a metadata fetch)
rows = beeline_sql(
    "SELECT r.r_name, count(*) AS n_nations "
    "FROM mhs_serve_it.nation n JOIN mhs_serve_it.region r "
    "ON n.n_regionkey = r.r_regionkey "
    "GROUP BY r.r_name ORDER BY r.r_name", port={PORT})
assert len(rows) == 5 and all(int(r[1]) == 5 for r in rows), rows

# 3. the reference-shaped model is served by default on a fresh boot
rows = beeline_sql(
    "SELECT role, count(*) AS n FROM mhs_serve_it.ref_users "
    "GROUP BY role ORDER BY role", port={PORT})
roles = {{r[0]: int(r[1]) for r in rows}}
assert roles.get("worker", 0) > 0 and roles.get("buyer", 0) > 0, rows
assert "ghost" in roles, rows  # the out-of-enum quirk row is served too

# 4. the WRITE-lifecycle input tables are served: replay
#    ref_post_task_batch's request-building join/guards (reference_model.py
#    _POST_TASK_ORACLE's req CTE) over the endpoint — proves the default-on
#    model covers every table the ledger folds read (ref_tasks, ref_users;
#    ref_withdrawals for the withdrawal fold).
rows = beeline_sql(
    "SELECT count(*) AS n_requests, count(DISTINCT t.buyer_email) AS n_buyers "
    "FROM mhs_serve_it.ref_tasks t "
    "JOIN mhs_serve_it.ref_users u ON u.email = t.buyer_email "
    "WHERE u.role = 'buyer' AND t.required_workers > 0 "
    "AND t.payable_amount > 0", port={PORT})
assert int(rows[0][0]) > 0 and int(rows[0][1]) > 0, rows
rows = beeline_sql(
    "SELECT count(*) FROM mhs_serve_it.ref_withdrawals", port={PORT})
assert int(rows[0][0]) > 0, rows
print("THRIFT_OK")
spark.stop()
"""


def test_thrift_endpoint_round_trips_sql():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-3000:]}"
    assert "THRIFT_OK" in proc.stdout, proc.stdout
