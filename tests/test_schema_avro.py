"""Schema conversion + pure-Python Avro codec (mirrors the reference's only
unit test, BaseProducerTest.testSerializeAvro — encode->decode round trip —
and extends it across the full type surface)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from hiveka_spark.schema import avro_to_struct, ddl_to_struct, struct_to_avro
from hiveka_spark.sources.avro_codec import decode_record, encode_record

NESTED = T.StructType(
    [
        T.StructField("a", T.IntegerType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.DoubleType(), True),
        T.StructField("d", T.BooleanType(), True),
        T.StructField("e", T.LongType(), True),
        T.StructField("f", T.FloatType(), True),
        T.StructField("g", T.BinaryType(), True),
        T.StructField("arr", T.ArrayType(T.LongType(), containsNull=False), True),
        T.StructField("m", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("x", T.IntegerType(), True),
                    T.StructField("y", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def test_struct_avro_struct_roundtrip():
    avro = struct_to_avro(NESTED, "t")
    back = avro_to_struct(avro)
    assert [f.name for f in back.fields] == [f.name for f in NESTED.fields]
    assert back["a"].dataType == T.IntegerType() and back["a"].nullable is False
    assert back["arr"].dataType == T.ArrayType(T.LongType(), containsNull=False)
    assert back["m"].dataType.keyType == T.StringType()
    assert isinstance(back["nested"].dataType, T.StructType)


def test_ddl_to_struct():
    s = ddl_to_struct("a INT, b STRING, ts TIMESTAMP, v ARRAY<FLOAT>")
    assert [f.name for f in s.fields] == ["a", "b", "ts", "v"]
    assert s["v"].dataType == T.ArrayType(T.FloatType())


def test_demo_record_roundtrip():
    """The reference's own test case: {a int, b string} through binary Avro
    (BaseProducerTest.java:17-52)."""
    schema = struct_to_avro(ddl_to_struct("a INT, b STRING"), "test_schema_1")
    rec = {"a": 7, "b": "static test string"}
    payload = encode_record(schema, rec)
    assert isinstance(payload, bytes) and len(payload) > 0
    assert decode_record(schema, payload) == rec


@pytest.mark.parametrize(
    "ddl,rec",
    [
        ("x BIGINT", {"x": -(2**62)}),
        ("x BIGINT", {"x": 2**62}),
        ("x INT", {"x": 0}),
        ("x DOUBLE", {"x": math.pi}),
        ("x BOOLEAN", {"x": True}),
        ("x STRING", {"x": "unicode: héllo wörld 中文"}),
        ("x STRING", {"x": ""}),
        ("x BINARY", {"x": b"\x00\xff\x01"}),
        ("x INT, y STRING", {"x": None, "y": None}),  # nullable unions
        ("a ARRAY<BIGINT>", {"a": [1, -2, 3]}),
        ("a ARRAY<BIGINT>", {"a": []}),
        ("m MAP<STRING,STRING>", {"m": {"k1": "v1", "k2": "v2"}}),
        ("s STRUCT<p: INT, q: STRING>", {"s": {"p": 1, "q": "z"}}),
    ],
)
def test_primitive_roundtrips(ddl, rec):
    schema = struct_to_avro(ddl_to_struct(ddl))
    out = decode_record(schema, encode_record(schema, rec))
    assert out == rec


def test_float_roundtrip_precision():
    schema = struct_to_avro(ddl_to_struct("x FLOAT"))
    out = decode_record(schema, encode_record(schema, {"x": 0.25}))
    assert out["x"] == 0.25  # exactly representable in float32


def test_corrupt_payload_raises():
    schema = struct_to_avro(ddl_to_struct("a STRING"))
    with pytest.raises(Exception):
        decode_record(schema, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")


def test_trailing_bytes_raise():
    """A valid record followed by junk is NOT a valid payload — a decoder
    that stops early would silently accept a different schema's encoding."""
    schema = struct_to_avro(ddl_to_struct("a INT"))
    payload = encode_record(schema, {"a": 7})
    with pytest.raises(ValueError, match="trailing"):
        decode_record(schema, payload + b"\x02")


def test_truncated_fixed_width_raises():
    """Truncation inside a double/boolean must raise (EOFError), not decode
    as 0.0/False."""
    schema = struct_to_avro(ddl_to_struct("a DOUBLE"))
    payload = encode_record(schema, {"a": math.pi})
    with pytest.raises(Exception):
        decode_record(schema, payload[: len(payload) - 2])
    bschema = struct_to_avro(ddl_to_struct("b BOOLEAN"))
    with pytest.raises(Exception):
        decode_record(bschema, b"")  # boolean read at EOF


def test_multibranch_union_selects_branch_by_type():
    """['null','long','string'] unions must encode each value into ITS branch
    (external Avro readers see the right type), and decode back exactly."""
    schema = {
        "type": "record",
        "name": "u",
        "fields": [{"name": "v", "type": ["null", "long", "string"]}],
    }
    for val in (None, 42, "forty-two"):
        assert decode_record(schema, encode_record(schema, {"v": val})) == {"v": val}
    # booleans are not ints: bool must NOT land in the long branch
    bschema = {
        "type": "record",
        "name": "ub",
        "fields": [{"name": "v", "type": ["null", "boolean", "long"]}],
    }
    assert decode_record(bschema, encode_record(bschema, {"v": True})) == {"v": True}
    assert decode_record(bschema, encode_record(bschema, {"v": 1})) == {"v": 1}


def test_ambiguous_union_raises():
    schema = {
        "type": "record",
        "name": "amb",
        "fields": [{"name": "v", "type": ["null", "int", "long"]}],
    }
    with pytest.raises(ValueError, match="ambiguous"):
        encode_record(schema, {"v": 5})
    # no matching branch -> clear error, not silent coercion
    sschema = {
        "type": "record",
        "name": "s",
        "fields": [{"name": "v", "type": ["null", "string"]}],
    }
    with pytest.raises(ValueError, match="no union branch"):
        encode_record(sschema, {"v": 5})
