"""From-scratch protobuf runtime for the transformWithState state
protocol (streaming/state_protocol.py): descriptor extraction, wire
vectors, message round trips, shim install semantics. The ultimate
cross-check is the JVM itself (tests/test_streaming.py runs the
typed-state stream for real); these tests pin the local invariants."""

from __future__ import annotations

import sys

import pytest

from datalake_polygonscan_spark.streaming.state_protocol import (
    PB2_MODULE,
    _read_varint,
    _write_varint,
    build_module,
    extract_descriptor_bytes,
    install,
    parse_file_descriptor,
)


@pytest.fixture(scope="module")
def pb2():
    return build_module()


def test_varint_wire_vectors():
    """Canonical protobuf varint encodings (public wire-format doc):
    0->00, 1->01, 127->7f, 128->80 01, 300->ac 02; negatives are
    10-byte two's complement."""
    vectors = {0: "00", 1: "01", 127: "7f", 128: "8001", 300: "ac02"}
    for n, want in vectors.items():
        out = bytearray()
        _write_varint(n, out)
        assert bytes(out).hex() == want, n
        assert _read_varint(bytes(out), 0)[0] == n
    out = bytearray()
    _write_varint(-1, out)
    assert bytes(out).hex() == "ff" * 9 + "01"  # 64-bit two's complement


def test_descriptor_covers_the_client_surface(pb2):
    """Every message/enum symbol the four state-client modules
    reference must exist on the shim module."""
    data = extract_descriptor_bytes()
    _pkg, msgs, enums = parse_file_descriptor(data)
    assert len(msgs) >= 40
    needed = [
        "StateRequest", "StatefulProcessorCall", "StateCallCommand",
        "SetHandleState", "SetImplicitKey", "RemoveImplicitKey",
        "ImplicitGroupingKeyRequest", "StateVariableRequest",
        "ValueStateCall", "ValueStateUpdate", "ListStateCall", "MapStateCall",
        "Exists", "Get", "Clear", "AppendValue", "AppendList",
        "ContainsKey", "UpdateValue", "GetValue", "Keys", "Values",
        "StateResponse", "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal", "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues", "StateResponseWithMapIterator",
        "StateResponseWithTimer", "TimerRequest", "UtilsRequest",
        "ParseStringSchema",
    ]
    for name in needed:
        assert hasattr(pb2, name), name
    for enum_val in ("PRE_INIT", "CREATED", "INITIALIZED",
                     "DATA_PROCESSED", "TIMER_PROCESSED", "CLOSED"):
        assert isinstance(getattr(pb2, enum_val), int)


def test_handshake_message_exact_bytes(pb2):
    """The PRE_INIT handshake the api client sends, byte-for-byte:
    StateRequest.statefulProcessorCall(field 2) >
    StatefulProcessorCall.setHandleState(field 1) >
    SetHandleState.state = INITIALIZED(2)."""
    req = pb2.StateRequest(
        statefulProcessorCall=pb2.StatefulProcessorCall(
            setHandleState=pb2.SetHandleState(state=pb2.INITIALIZED)
        )
    )
    assert req.SerializeToString().hex() == "12040a020802"


def test_kwargs_attribute_and_autovivify_roundtrip(pb2):
    cmd = pb2.StateCallCommand()
    cmd.stateName = "totals"
    cmd.schema = '{"n":"long"}'
    cmd.ttl.durationMs = 5000  # auto-vivified nested message
    wire = cmd.SerializeToString()
    back = pb2.StateCallCommand()
    back.ParseFromString(wire)
    assert back.stateName == "totals"
    assert back.schema == '{"n":"long"}'
    assert back.ttl.durationMs == 5000


def test_repeated_bytes_and_unknown_fields(pb2):
    msg = pb2.AppendList(value=[b"\x01\x02", b"", b"xyz"], fetchWithArrow=False)
    wire = msg.SerializeToString()
    back = pb2.AppendList()
    back.ParseFromString(wire)
    assert back.value == [b"\x01\x02", b"", b"xyz"]
    # unknown trailing field (number 900, varint) is skipped cleanly
    extra = bytearray(wire)
    _write_varint((900 << 3) | 0, extra)
    _write_varint(7, extra)
    back2 = pb2.AppendList()
    back2.ParseFromString(bytes(extra))
    assert back2.value == [b"\x01\x02", b"", b"xyz"]


def test_empty_oneof_member_emits_presence(pb2):
    """Exists() vs Get() discriminate only by WHICH empty message is
    set — the serialized form must carry the empty submessage."""
    call_exists = pb2.ValueStateCall(stateName="s", exists=pb2.Exists())
    call_get = pb2.ValueStateCall(stateName="s", get=pb2.Get())
    assert call_exists.SerializeToString() != call_get.SerializeToString()
    assert len(call_exists.SerializeToString()) > len(
        pb2.ValueStateCall(stateName="s").SerializeToString()
    )


def test_response_defaults_when_absent(pb2):
    resp = pb2.StateResponse()
    resp.ParseFromString(b"")  # all fields absent
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b""


def test_install_idempotent_and_gated():
    before = sys.modules.get(PB2_MODULE)
    try:
        first = install()
        second = install()
        try:
            from google.protobuf import descriptor  # noqa: F401

            assert first is False and second is False
        except ImportError:
            assert first is True and second is True
            assert getattr(sys.modules[PB2_MODULE], "_SCRATCH_STATE_PROTOCOL__", False)
    finally:
        if before is not None:
            sys.modules[PB2_MODULE] = before
