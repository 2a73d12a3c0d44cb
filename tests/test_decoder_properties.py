"""Property-based fuzzing of the hand-rolled container parsers and the
BPE merge rule (pure Python — no Spark jobs, so examples are cheap).

The oracle gate pins the decoders on the FORMULA-generated fixture
payloads; these pin them on arbitrary generated containers: every
padding width, top-down AND bottom-up row order, arbitrary extra RIFF
chunks with odd sizes (alignment byte), and the guarantee that a
truncated container raises instead of returning silently-wrong pixels
or samples."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_hive_server_spark.operators.multimodal import (
    decode_bmp,
    decode_wav_pcm16,
)

_settings = settings(max_examples=60, deadline=None)


def _build_bmp(w: int, h: int, rgb: bytes, top_down: bool) -> bytes:
    """Independent little BMP writer for the fuzz tests: top-down
    containers store height NEGATIVE and rows in natural order."""
    pad = (4 - (w * 3) % 4) % 4
    ys = range(h) if top_down else range(h - 1, -1, -1)
    rows = []
    for y in ys:
        row = bytearray()
        for x in range(w):
            o = (y * w + x) * 3
            row += bytes((rgb[o + 2], rgb[o + 1], rgb[o]))  # BGR on disk
        rows.append(bytes(row) + b"\x00" * pad)
    pixels = b"".join(rows)
    offset = 54
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        24,
        0,
        len(pixels),
        2835,
        2835,
        0,
        0,
    )
    return header + info + pixels


@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
    top_down=st.booleans(),
)
@_settings
def test_bmp_decode_inverts_encode(w, h, data, top_down):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    got_w, got_h, got = decode_bmp(_build_bmp(w, h, rgb, top_down))
    assert (got_w, got_h, got) == (w, h, rgb)


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=6),
    cut=st.integers(min_value=0, max_value=200),
)
@_settings
def test_bmp_truncation_raises_never_garbage(w, h, cut):
    full = _build_bmp(w, h, bytes(w * h * 3), top_down=False)
    needed = 54 + ((w * 3 + 3) // 4 * 4) * h
    prefix = full[: min(cut, len(full))]
    if len(prefix) < needed:
        with pytest.raises(ValueError):
            decode_bmp(prefix)
    else:
        assert decode_bmp(prefix)[0] == w


def test_bmp_header_offset_must_point_past_headers():
    """A malformed pixel offset pointing into (or before) the header
    region must raise, not silently decode header bytes as pixels —
    the truncation fuzz keeps a VALID offset, so it never hits this
    path (round-11 review)."""
    full = bytearray(_build_bmp(3, 2, bytes(3 * 2 * 3), top_down=False))
    for bad_offset in (0, 10, 53):
        m = bytes(full[:10]) + struct.pack("<I", bad_offset) + bytes(full[14:])
        with pytest.raises(ValueError):
            decode_bmp(m)
    # past-EOF offset must raise too (not index garbage)
    m = bytes(full[:10]) + struct.pack("<I", len(full) + 100) + bytes(full[14:])
    with pytest.raises(ValueError):
        decode_bmp(m)


def _build_wav(rate: int, samples: list[int], extra_chunks: list[bytes]) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE"
    for ch in extra_chunks:
        body += ch
    body += fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


_chunk = st.binary(min_size=0, max_size=7).map(
    # arbitrary chunk id + ODD-or-even body; writer appends the RIFF
    # alignment byte exactly when the body length is odd
    lambda b: b"LIST"
    + struct.pack("<I", len(b))
    + b
    + (b"\x00" if len(b) % 2 else b"")
)


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=40
    ),
    chunks=st.lists(_chunk, min_size=0, max_size=3),
)
@_settings
def test_wav_decode_inverts_encode_past_arbitrary_chunks(rate, samples, chunks):
    got_rate, got = decode_wav_pcm16(_build_wav(rate, samples, chunks))
    assert (got_rate, got) == (rate, samples)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=20
    ),
    cut=st.integers(min_value=0, max_value=100),
)
@_settings
def test_wav_truncation_raises_never_garbage(samples, cut):
    full = _build_wav(8000, samples, [])
    prefix = full[: min(cut, len(full))]
    if len(prefix) < len(full):
        with pytest.raises(ValueError):
            decode_wav_pcm16(prefix)
    else:
        assert decode_wav_pcm16(prefix)[1] == samples


# ------------------------------------------- BPE merge-rule equivalence


def _greedy_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Reference left-to-right greedy BPE merge on a token list."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@given(
    tokens=st.lists(
        st.sampled_from(["a", "b", "c", "ab", "bc", "aa"]),
        min_size=1,
        max_size=12,
    ),
    pair=st.sampled_from(
        [("a", "a"), ("a", "b"), ("b", "c"), ("ab", "c"), ("c", "ab")]
    ),
)
@_settings
def test_bpe_string_replace_equals_greedy_list_merge(tokens, pair):
    """The bracket-delimited trick `tokenizer_bpe_merges` runs in BOTH
    engines — replace('[a][b]', '[ab]') on '[t1][t2]...' — must equal
    the reference greedy left-to-right list merge for EVERY token
    sequence: overlapping runs ([a,a,a] with pair (a,a) → [aa,a]),
    tokens that have the pair members as prefixes/suffixes ([a,ab] with
    (a,a) must NOT merge), and tokens that are concatenations. The fuzz
    originally falsified the plain single-'|' encoding on exactly the
    prefix case — the reason the operator wraps both token boundaries."""
    a, b = pair
    s = "".join(f"[{t}]" for t in tokens)
    merged = s.replace(f"[{a}][{b}]", f"[{a}{b}]")
    via_string = merged[1:-1].split("][")
    assert via_string == _greedy_merge(tokens, a, b)


@given(
    w=st.integers(min_value=2, max_value=8),
    h=st.integers(min_value=1, max_value=6),
    data=st.data(),
    shift=st.integers(min_value=0, max_value=40),
)
@_settings
def test_dhash_invariant_under_brightness_shift(w, h, data, shift):
    """dHash's defining property — the reason `multimodal_phash_dedup`
    clusters brightness variants: adding a constant to every byte (no
    wraparound) preserves every pairwise luminance comparison, so the
    hash is unchanged for ANY base image, not just the planted ones."""
    from mini_hive_server_spark.operators.multimodal import dhash_rgb

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 215), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    shifted = bytes(v + shift for v in rgb)
    assert dhash_rgb(w, h, rgb) == dhash_rgb(w, h, shifted)


def test_dhash_survives_container_roundtrip_and_separates_groups():
    """The planted-variant generator → generic BMP parse → dHash chain
    must (a) yield the hash of the closed-form pixel stream (container
    normalization loses nothing), (b) collapse every brightness variant
    of one base image to one hash, and (c) keep distinct base images
    apart (the fixture's 37 bases produce 37 distinct (hash, dims)
    keys — verified exhaustively, not probabilistically)."""
    from mini_hive_server_spark.operators.multimodal import (
        _PHASH_BASE_MOD,
        _PHASH_GROUPS,
        _phash_group_dims,
        decode_bmp,
        dhash_rgb,
        synthesize_bmp_variant,
    )

    keys = {}
    for doc_id in range(3 * _PHASH_GROUPS):
        w, h, rgb = decode_bmp(synthesize_bmp_variant(doc_id))
        grp = doc_id % _PHASH_GROUPS
        assert (w, h) == _phash_group_dims(grp)
        base = bytes(
            (grp * 17 + i * 11) % _PHASH_BASE_MOD for i in range(w * h * 3)
        )
        code = dhash_rgb(w, h, rgb)
        assert code == dhash_rgb(w, h, base), doc_id  # (a) + (b)
        keys.setdefault(grp, (code, w, h))
        assert keys[grp] == (code, w, h), doc_id  # (b) across variants
    assert len(set(keys.values())) == _PHASH_GROUPS  # (c)


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
@_settings
def test_resize_nn_identity_and_corner_anchoring(w, h, data):
    """Nearest-neighbor resample: same-size resize is the identity (the
    floor mapping hits every source pixel exactly once), and the (0,0)
    output pixel is always the (0,0) source pixel (corner convention —
    the property an off-by-one or center-offset bug breaks first).
    Downscale outputs must each equal SOME source pixel verbatim (NN
    never synthesizes values)."""
    from mini_hive_server_spark.operators.multimodal import resize_nn

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert resize_nn(w, h, rgb, w, h) == rgb
    tw = data.draw(st.integers(1, w))
    th = data.draw(st.integers(1, h))
    out = resize_nn(w, h, rgb, tw, th)
    assert len(out) == tw * th * 3
    assert out[0:3] == rgb[0:3]
    src_pixels = {rgb[i : i + 3] for i in range(0, len(rgb), 3)}
    for i in range(0, len(out), 3):
        assert out[i : i + 3] in src_pixels


@given(
    samples=st.lists(st.integers(-2048, 2047), min_size=0, max_size=80),
)
@_settings
def test_segment_energy_invariants(samples):
    """Activity segmentation invariants for arbitrary PCM: active count
    never exceeds frames, segments never exceed active frames (a run
    needs at least one), all-equal-energy inputs have ZERO active frames
    (nothing is strictly above the mean — the tie convention the oracle's
    cross-multiplied test encodes), and sign-flipping the waveform
    changes nothing (energy is even)."""
    from mini_hive_server_spark.operators.multimodal import segment_energy

    nf, na, ns, tot = segment_energy(samples)
    assert nf == len(samples) // 10
    assert 0 <= ns <= na <= nf
    assert tot == sum(
        v * v for v in samples[: nf * 10]
    )
    flipped = [-v if v != -2048 else v for v in samples]
    if flipped == [-v for v in samples]:
        assert segment_energy(flipped) == (nf, na, ns, tot)
    const = [7] * len(samples)
    assert segment_energy(const)[1] == 0
