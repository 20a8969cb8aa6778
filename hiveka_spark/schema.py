"""Schema conversion: Spark DDL <-> StructType <-> Avro schema JSON.

Parity targets in the reference:
- expected-schema-from-.avsc-file: KafkaAvroMessageDecoder.java:49-68 (A20)
- expected-schema-from-DDL-columns: AvroSchemaGenerator.java:19-32 via Hive's
  TypeInfoToSchema (A21) — every column becomes a nullable union
  ["null", T], which we mirror for round-trip stability.

The Avro side is plain JSON dicts (no avro library dependency); the Spark
side is StructType.  Logical types: timestamp-micros <-> TimestampType,
date <-> DateType.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVE_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}

_AVRO_TO_PRIMITIVE = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


_SIMPLE_DDL_TYPES = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "decimal": T.DecimalType(10, 0),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at angle/paren nesting depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_ddl_type(s: str) -> T.DataType:
    s = s.strip()
    low = s.lower()
    if low.startswith("array"):
        inner = s[s.index("<") + 1 : s.rindex(">")]
        return T.ArrayType(_parse_ddl_type(inner))
    if low.startswith("map"):
        inner = s[s.index("<") + 1 : s.rindex(">")]
        k, v = _split_top(inner)
        return T.MapType(_parse_ddl_type(k), _parse_ddl_type(v))
    if low.startswith("struct"):
        inner = s[s.index("<") + 1 : s.rindex(">")]
        fields = []
        for part in _split_top(inner):
            name, _, ftype = part.partition(":")
            fields.append(T.StructField(name.strip(), _parse_ddl_type(ftype), True))
        return T.StructType(fields)
    if low.startswith("decimal"):
        if "(" in s:
            p, sc = _split_top(s[s.index("(") + 1 : s.rindex(")")])
            return T.DecimalType(int(p), int(sc))
        return T.DecimalType(10, 0)
    if "(" in low:  # varchar(n)/char(n)
        low = low[: low.index("(")].strip()
    if low in _SIMPLE_DDL_TYPES:
        return _SIMPLE_DDL_TYPES[low]
    raise ValueError(f"unsupported DDL type: {s!r}")


def ddl_to_struct(ddl: str) -> T.StructType:
    """Parse a Hive/Spark DDL column list ('a INT, b STRING') into a
    StructType — the analog of the reference reading `columns`/`columns.types`
    table properties (KafkaBackedTableProperties.java:72-85).  Standalone
    parser (no SparkSession required, unlike StructType.fromDDL)."""
    fields = []
    for part in _split_top(ddl):
        name, _, ftype = part.partition(" ")
        if ":" in name:  # also accept 'name: type' form
            name, _, ftype = part.partition(":")
        fields.append(T.StructField(name.strip(), _parse_ddl_type(ftype), True))
    return T.StructType(fields)


def _field_to_avro(dt: T.DataType, name: str, namespace: str) -> Any:
    for cls, avro in _PRIMITIVE_TO_AVRO.items():
        if isinstance(dt, cls):
            return avro
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        item = _field_to_avro(dt.elementType, name + "_item", namespace)
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        value = _field_to_avro(dt.valueType, name + "_value", namespace)
        if dt.valueContainsNull:
            value = ["null", value]
        return {"type": "map", "values": value}
    if isinstance(dt, T.StructType):
        return struct_to_avro(dt, record_name=name, namespace=namespace)
    raise ValueError(f"unsupported Spark type for Avro conversion: {dt}")


def struct_to_avro(
    schema: T.StructType,
    record_name: str = "record0",
    namespace: str = "hiveka_spark",
) -> dict:
    """StructType -> Avro record schema (dict).  Nullable fields become
    ["null", T] unions with null default — matching the Hive convention the
    reference relies on (TypeInfoToSchema wraps every column nullable)."""
    fields = []
    for f in schema.fields:
        ft = _field_to_avro(f.dataType, f.name, namespace)
        if f.nullable:
            fields.append({"name": f.name, "type": ["null", ft], "default": None})
        else:
            fields.append({"name": f.name, "type": ft})
    return {
        "type": "record",
        "name": record_name,
        "namespace": namespace,
        "fields": fields,
    }


def _avro_type_to_spark(t: Any) -> tuple[T.DataType, bool]:
    """Avro type -> (Spark type, nullable)."""
    if isinstance(t, str):
        if t not in _AVRO_TO_PRIMITIVE:
            raise ValueError(f"unsupported Avro primitive: {t}")
        return _AVRO_TO_PRIMITIVE[t], False
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        nullable = len(branches) != len(t)
        if len(branches) != 1:
            raise ValueError(f"only nullable unions supported, got: {t}")
        dt, inner_null = _avro_type_to_spark(branches[0])
        return dt, nullable or inner_null
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical == "timestamp-micros" or logical == "timestamp-millis":
            return T.TimestampType(), False
        if logical == "date":
            return T.DateType(), False
        if logical == "decimal":
            return T.DecimalType(t["precision"], t["scale"]), False
        kind = t["type"]
        if kind == "record":
            return avro_to_struct(t), False
        if kind == "array":
            item, item_null = _avro_type_to_spark(t["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if kind == "map":
            value, value_null = _avro_type_to_spark(t["values"])
            return T.MapType(T.StringType(), value, valueContainsNull=value_null), False
        if kind == "enum":
            return T.StringType(), False
        if kind == "fixed":
            return T.BinaryType(), False
        return _avro_type_to_spark(kind)  # {"type": "string"} wrapper form
    raise ValueError(f"unsupported Avro type: {t!r}")


def avro_to_struct(avro_schema: dict | str) -> T.StructType:
    """Avro record schema (dict or JSON string) -> StructType — the analog of
    parsing `kafka.avro.schema.file` (KafkaAvroMessageDecoder.java:49-68)."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    if avro_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in avro_schema["fields"]:
        dt, nullable = _avro_type_to_spark(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable=nullable))
    return T.StructType(fields)


def avro_json(schema: T.StructType, record_name: str = "record0") -> str:
    return json.dumps(struct_to_avro(schema, record_name))
