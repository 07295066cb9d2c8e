"""Property-based tests (hypothesis) for the pure-Python decision
logic the engine's correctness rests on — filter-pushdown bounds
algebra and exact-decimal update arithmetic. No SparkSession: these
run hundreds of generated cases in milliseconds."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
)

from datalake_polygonscan_spark.io.paginated_source import WalletTransfersReader

_OPS = (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo)


def _eval(f, v: int) -> bool:
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    return v == f.value


_filters = st.lists(
    st.tuples(st.sampled_from(_OPS), st.integers(-50, 50)), min_size=0, max_size=6
).map(lambda ts: [op(("blockNumber",), v) for op, v in ts])


@given(_filters, st.integers(-60, 60))
@settings(max_examples=300, deadline=None)
def test_pushdown_bounds_equal_conjunction_of_consumed_filters(filters, probe):
    """pushFilters consumes range/equality conjuncts into [lo, hi]
    bounds; since consumed filters vanish from Spark's plan, the
    bounds MUST accept exactly the values satisfying EVERY consumed
    filter — including contradictions (empty interval), the ADVICE-r3
    EqualTo-overwrite bug class."""
    reader = WalletTransfersReader({"path": "/nonexistent"})
    leftover = list(reader.pushFilters(list(filters)))
    assert not leftover  # all blockNumber conjuncts are consumable
    want = all(_eval(f, probe) for f in filters)
    assert reader._in_bounds("blockNumber", probe) == want


@given(
    st.lists(
        st.decimals(
            min_value=-1000, max_value=1000, places=12, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    st.permutations(range(40)),
)
@settings(max_examples=150, deadline=None)
def test_exact_decimal_sum_is_order_insensitive(values, perm):
    """The determinism contract under ML3/G2/MV1: a DECIMAL-quantized
    sum is identical under ANY accumulation order (a float sum is
    not) — the property that makes gradients/ranks/MV deltas
    bit-reproducible across partitionings."""
    order = [p for p in perm if p < len(values)]
    a = sum((values[i] for i in order), Decimal(0))
    b = sum(sorted(values), Decimal(0))
    assert a == b


@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=30),
    st.integers(2, 6),
)
@settings(max_examples=200, deadline=None)
def test_winnowing_reference_guarantee(hashes, w):
    """Pure-Python mirror of the windowed-minimum selection: every
    selected fingerprint is a member of the sequence, and every
    window of w consecutive hashes is covered by at least one
    selected value <= its elements (the guarantee the Spark
    implementation encodes with sequence/slice/array_min)."""
    n = len(hashes)
    if n >= w:
        picks = {min(hashes[i : i + w]) for i in range(n - w + 1)}
    else:
        picks = {min(hashes)}
    assert picks <= set(hashes)
    if n >= w:
        for i in range(n - w + 1):
            assert min(hashes[i : i + w]) in picks


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=60)),
        min_size=1,
        max_size=25,
    ),
    st.floats(min_value=0.02, max_value=0.5),
)
def test_heavy_hitter_summary_guarantee(key_freqs, theta):
    """A6's candidate-generation math, pure-Python replica: per-
    partition top-k-with-deficiency summaries must surface EVERY key
    whose global frequency >= ceil(theta * n), for any partitioning —
    the telescoping-deficiency guarantee heavy_hitters() relies on."""
    import math
    from collections import Counter

    rows = [f"k{k}" for k, f in key_freqs for _ in range(f)]
    n = len(rows)
    k_counters = math.ceil(1.0 / theta)
    # adversarial-ish fixed partitioning: round-robin into 4 parts
    parts = [rows[i::4] for i in range(4)]
    candidates = set()
    for p in parts:
        if not p:
            continue
        counts = Counter(p).most_common()
        err = counts[k_counters][1] if len(counts) > k_counters else 0
        for key, c in counts[:k_counters]:
            if c - err > 0:
                candidates.add(key)
    thresh = math.ceil(theta * n)
    heavy = {k for k, c in Counter(rows).items() if c >= thresh}
    # full recall: every theta-heavy key must be a candidate
    assert heavy <= candidates or not heavy


# ---------------------------------------------------------------------------
# round-9 primitives: from-scratch inflate and the Feistel permutation
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4000), st.sampled_from([0, 1, 6, 9]))
def test_scratch_inflate_inverts_zlib_compress(payload, level):
    """inflate(deflate(x)) == x for arbitrary payloads at every
    compression level (stored, fixed- and dynamic-Huffman blocks all
    appear across the sampled levels)."""
    import zlib

    from datalake_polygonscan_spark.operators.deflate import zlib_decompress_scratch

    assert zlib_decompress_scratch(zlib.compress(payload, level)) == payload


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**62 - 1), st.text(min_size=1, max_size=8))
def test_feistel_pure_python_roundtrip_and_domain(key, seed):
    """Driver-side replay of the Feistel rounds (same md5 construction
    as the codegen path): encrypt then decrypt is the identity for any
    key in [0, 2^62) under any seed, and tokens stay in-domain."""
    import hashlib

    half_bits = 31
    mask = (1 << half_bits) - 1

    def fr(v: int, r: int) -> int:
        h = hashlib.md5(f"{seed}{r}:{v}".encode()).hexdigest()
        return int(h[:15], 16) % (1 << half_bits)

    hi, lo = key >> half_bits, key & mask
    for r in range(1, 5):
        hi, lo = lo, hi ^ fr(lo, r)
    token = (hi << half_bits) | lo
    assert 0 <= token < 1 << 62

    hi, lo = token >> half_bits, token & mask
    for r in range(4, 0, -1):
        hi, lo = lo ^ fr(hi, r), hi
    assert (hi << half_bits) | lo == key


# ---------------------------------------------------------------------------
# Round 8: Avro binary codec + DEFLATE encoders + state-protocol runtime
# ---------------------------------------------------------------------------

_AVRO_ROW_SCHEMA = {
    "type": "record", "name": "row", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": ["null", {"type": "map", "values": "long"}]},
    ],
}

_avro_rows = st.fixed_dictionaries({
    "k": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "s": st.one_of(st.none(), st.text(max_size=40)),
    "d": st.one_of(st.none(), st.floats(allow_nan=False)),
    "b": st.booleans(),
    "raw": st.one_of(st.none(), st.binary(max_size=60)),
    "arr": st.lists(st.integers(-(2**31), 2**31), max_size=8),
    "m": st.one_of(
        st.none(),
        st.dictionaries(st.text(max_size=8), st.integers(-(2**31), 2**31), max_size=4),
    ),
})


@settings(max_examples=200, deadline=None)
@given(st.lists(_avro_rows, max_size=12))
def test_avro_binary_codec_roundtrips_any_rows(rows):
    """Property: the from-scratch Avro binary codec inverts itself on
    arbitrary rows of the full supported type lattice (nullable unions,
    arrays, maps, 64-bit extremes, NaN-free doubles, empty payloads)."""
    import json

    from datalake_polygonscan_spark.io.avro import _decoder_of, _encoder_of

    schema = json.loads(json.dumps(_AVRO_ROW_SCHEMA))
    enc, dec = _encoder_of(schema), _decoder_of(schema)
    out = bytearray()
    for r in rows:
        enc(r, out)
    buf, pos = bytes(out), 0
    back = []
    for _ in rows:
        row, pos = dec(buf, pos)
        back.append(row)
    assert pos == len(buf)
    assert back == rows


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=5000))
def test_deflate_encoders_inverted_by_both_decoders(payload):
    """Property: both from-scratch DEFLATE encoders produce streams
    that stdlib zlib AND the from-scratch inflate decode back exactly."""
    import zlib

    from datalake_polygonscan_spark.operators.deflate import (
        deflate_fixed,
        deflate_stored,
        inflate,
    )

    for enc in (deflate_stored, deflate_fixed):
        c = enc(payload)
        assert zlib.decompress(c, -15) == payload
        assert inflate(c) == payload


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.text(max_size=30),
    st.binary(max_size=50),
    st.booleans(),
)
def test_state_protocol_message_roundtrip(code, err, val, rnf):
    """Property: the hand-rolled protobuf runtime inverts itself on the
    response shapes the state clients parse."""
    from datalake_polygonscan_spark.streaming.state_protocol import build_module

    m = _STATE_PB2
    r = m.StateResponseWithListGet(
        statusCode=code, errorMessage=err, value=[val, b"", val * 2],
        requireNextFetch=rnf,
    )
    back = m.StateResponseWithListGet()
    back.ParseFromString(r.SerializeToString())
    assert back.statusCode == code
    assert back.errorMessage == err
    assert back.value == [val, b"", val * 2]
    assert back.requireNextFetch == rnf


from datalake_polygonscan_spark.streaming.state_protocol import build_module as _bm  # noqa: E402

_STATE_PB2 = _bm()
