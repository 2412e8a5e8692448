"""v2 -> v3 migration preview (reference: api/migrate_preview.go:37-85).

The converted doc must both match the expected v3 shape and parse
through the real v3 parser (round-trip into a runnable spec).
"""

import json

import pytest

from clickhouse_etl_spark.spec import convert_v2_to_v3, parse_pipeline_json
from clickhouse_etl_spark.spec.model import SpecError

V2_DOC = {
    "pipeline_id": "pipe-1",
    "name": "orders-enrich",
    "source": {
        "type": "kafka",
        "connection_params": {
            "brokers": ["b1:9092"],
            "mechanism": "PLAIN",
            "protocol": "SASL_SSL",
            "username": "u",
            "password": "p",
        },
        "topics": [
            {
                "id": "events",
                "name": "events-topic",
                "consumer_group_initial_offset": "earliest",
                "deduplication": {
                    "enabled": True,
                    "id_field": "event_id",  # older v2 spelling of 'key'
                    "time_window": "1h",
                },
            },
            {
                "name": "orders",  # no id -> topic name becomes source_id
                "deduplication": {"enabled": False},
            },
        ],
    },
    "schema": {
        "fields": [
            {"source_id": "events", "name": "event_id", "type": "int",
             "column_name": "event_id", "column_type": "Int64"},
            {"source_id": "events", "name": "user_id", "type": "int"},
            {"source_id": "orders", "name": "o_custkey", "type": "int"},
            {"source_id": "orders", "name": "o_totalprice", "type": "float",
             "column_name": "total_price", "column_type": "Float64"},
        ]
    },
    "filter": {"enabled": True, "expression": "value > 50"},
    "stateless_transformation": {
        "enabled": True,
        "source_id": "events",
        "config": {
            "transform": [
                # 'value' is NOT in the declared events schema -> must be
                # supplemented (migrate_preview.go:305-334)
                {"expression": "value * 2", "output_name": "doubled",
                 "output_type": "float64"},
            ]
        },
    },
    "join": {
        "enabled": True,
        "type": "temporal",
        "sources": [
            {"source_id": "orders", "join_key": "o_custkey",
             "time_window": "1h", "orientation": "right"},
            {"source_id": "events", "join_key": "user_id",
             "time_window": "1h", "orientation": "left"},
        ],
    },
    "sink": {
        "type": "clickhouse",
        # older flat connection fields (no nested connection_params)
        "host": "ch", "port": "9000", "database": "db",
        "username": "sa", "password": "c2VjcmV0",  # base64('secret')
        "table": "out",
        "max_batch_size": 500,
        "max_delay_time": "30s",
    },
    "metadata": {"team": "data"},
}


def test_convert_v2_to_v3_shape():
    v3 = convert_v2_to_v3(json.dumps(V2_DOC))
    assert v3["version"] == "v3"
    assert v3["pipeline_id"] == "pipe-1"

    # sources: ids resolved, fields split by source_id, conn copied
    by_id = {s["source_id"]: s for s in v3["sources"]}
    assert set(by_id) == {"events", "orders"}
    assert by_id["events"]["topic"] == "events-topic"
    assert by_id["orders"]["topic"] == "orders"
    assert by_id["events"]["connection_params"]["brokers"] == ["b1:9092"]
    ev_fields = {f["name"]: f["type"] for f in by_id["events"]["schema_fields"]}
    # declared fields + the supplemented transform input 'value'
    assert ev_fields == {"event_id": "int", "user_id": "int", "value": "float64"}

    # transforms: dedup (id_field -> key), filter, stateless — in order
    kinds = [(t["type"], t["source_id"]) for t in v3["transforms"]]
    assert kinds == [("dedup", "events"), ("filter", "events"), ("stateless", "events")]
    assert v3["transforms"][0]["config"]["key"] == "event_id"
    assert v3["transforms"][0]["config"]["time_window"] == "1h"

    # join re-keyed by orientation; schema fields -> output_fields
    j = v3["join"]
    assert j["enabled"] is True
    assert j["left_source"] == {"source_id": "events", "key": "user_id", "time_window": "1h"}
    assert j["right_source"] == {"source_id": "orders", "key": "o_custkey", "time_window": "1h"}
    out_names = {(o["source_id"], o["name"]): o.get("output_name") for o in j["output_fields"]}
    assert out_names[("orders", "o_totalprice")] == "total_price"
    assert out_names[("events", "user_id")] is None

    # sink: flat fields promoted, password base64-decoded, mapping from
    # schema fields carrying column_name
    sink = v3["sink"]
    assert sink["connection_params"]["host"] == "ch"
    assert sink["connection_params"]["password"] == "secret"
    assert {m["name"]: m["column_name"] for m in sink["mapping"]} == {
        "event_id": "event_id", "o_totalprice": "total_price",
    }
    assert v3["metadata"] == {"team": "data"}


def test_convert_round_trips_into_v3_parser():
    v3 = convert_v2_to_v3(V2_DOC)
    spec = parse_pipeline_json(v3)
    assert spec.pipeline_id == "pipe-1"
    assert spec.join is not None and spec.join.left.key == "user_id"
    ev = spec.source("events")
    assert ev.dedup is not None and ev.dedup.key == "event_id"
    assert ev.filter is not None and ev.transform is not None
    assert spec.sink.max_batch_size == 500


def test_convert_explicit_mapping_wins_and_plain_password_passthrough():
    doc = dict(V2_DOC)
    doc["sink"] = dict(V2_DOC["sink"])
    doc["sink"]["password"] = "not-base64!"
    doc["sink"]["mapping"] = [
        {"name": "event_id", "column_name": "eid", "column_type": "Int64"},
    ]
    v3 = convert_v2_to_v3(doc)
    assert v3["sink"]["connection_params"]["password"] == "not-base64!"
    assert v3["sink"]["mapping"] == [
        {"name": "event_id", "column_name": "eid", "column_type": "Int64"}
    ]


def test_convert_join_requires_both_orientations():
    doc = json.loads(json.dumps(V2_DOC))
    doc["join"]["sources"] = [doc["join"]["sources"][0]]  # right only
    with pytest.raises(SpecError, match="oriented sources"):
        convert_v2_to_v3(doc)


def test_convert_disabled_join_omitted():
    doc = json.loads(json.dumps(V2_DOC))
    doc["join"]["enabled"] = False
    v3 = convert_v2_to_v3(doc)
    assert "join" not in v3
