"""Schema-Registry client + tracker: fetch-on-unknown, backward-compat
gate, stop-pipeline signal (reference schema_v2/schema.go:56-146,
ingestor/processor.go:178-201)."""

import json

import pytest

from clickhouse_etl_spark.spec.model import Field
from clickhouse_etl_spark.spec.sr_client import (
    HTTPSchemaRegistryClient,
    IncompatibleSchemaError,
    SchemaNotFoundError,
    SchemaTracker,
    parse_registry_schema,
)

V1 = [Field("id", "string"), Field("n", "int")]
V2 = V1 + [Field("score", "float")]


class FakeClient:
    def __init__(self, schemas):
        self.schemas = schemas
        self.calls = []

    def get_schema(self, schema_id):
        self.calls.append(schema_id)
        if schema_id not in self.schemas:
            raise SchemaNotFoundError(schema_id)
        return self.schemas[schema_id]


def test_known_id_no_fetch():
    client = FakeClient({})
    t = SchemaTracker("s", {1: V1}, client=client)
    assert t.resolve(1) == tuple(V1)
    assert client.calls == []


def test_unknown_compatible_id_fetches_and_registers():
    client = FakeClient({2: V2})
    t = SchemaTracker("s", {1: V1}, client=client)
    assert t.resolve(2) == tuple(V2)
    assert client.calls == [2]
    assert t.latest == tuple(V2)
    # second resolve hits the catalog, not the registry
    assert t.resolve(2) == tuple(V2)
    assert client.calls == [2]


def test_unknown_incompatible_id_signals_and_raises():
    incompatible = [Field("id", "string")]  # drops 'n'
    client = FakeClient({3: incompatible})
    signals = []
    t = SchemaTracker("s", {1: V1}, client=client, signal=lambda c, r: signals.append((c, r)))
    with pytest.raises(IncompatibleSchemaError, match="removed"):
        t.resolve(3)
    assert signals and signals[0][0] == "ingestor:s"
    assert 3 not in t.versions


def test_registry_missing_id_signals_and_raises():
    client = FakeClient({})
    signals = []
    t = SchemaTracker("s", {1: V1}, client=client, signal=lambda c, r: signals.append((c, r)))
    with pytest.raises(SchemaNotFoundError):
        t.resolve(9)
    assert signals


def test_no_client_unknown_id():
    t = SchemaTracker("s", {1: V1})
    with pytest.raises(SchemaNotFoundError, match="no registry client"):
        t.resolve(2)


def test_parse_avro_and_json_schemas():
    avro = {
        "schemaType": "AVRO",
        "schema": json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "id", "type": "string"},
                    {"name": "n", "type": "long"},
                    {"name": "score", "type": ["null", "double"]},
                    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                ],
            }
        ),
    }
    got = {f.name: f.type for f in parse_registry_schema(avro)}
    assert got == {"id": "string", "n": "int64", "score": "float64", "ts": "int64"}

    js = {
        "schemaType": "JSON",
        "schema": json.dumps(
            {
                "type": "object",
                "properties": {
                    "id": {"type": "string"},
                    "n": {"type": "integer"},
                    "ok": {"type": ["boolean", "null"]},
                },
            }
        ),
    }
    got = {f.name: f.type for f in parse_registry_schema(js)}
    assert got == {"id": "string", "n": "int64", "ok": "bool"}


def test_http_client_stub_transport_and_auth():
    seen = {}

    def transport(req):
        seen["url"] = req.full_url
        seen["auth"] = req.get_header("Authorization")
        return json.dumps(
            {"schema": json.dumps({"type": "record", "fields": [{"name": "id", "type": "string"}]})}
        ).encode()

    c = HTTPSchemaRegistryClient(
        url="http://sr:8081/", api_key="k", api_secret="s", _transport=transport
    )
    fields = c.get_schema(42)
    assert fields == [Field("id", "string")]
    assert seen["url"] == "http://sr:8081/schemas/ids/42"
    assert seen["auth"].startswith("Basic ")


def test_check_batch_resolves_distinct_ids(spark):
    client = FakeClient({2: V2})
    t = SchemaTracker("s", {1: V1}, client=client)
    df = spark.createDataFrame([(1,), (2,), (2,), (None,)], ["_schema_id"])
    got = t.check_batch(df)
    assert set(got) == {1, 2}
    assert client.calls == [2]
