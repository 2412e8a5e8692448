"""v2 -> v3 pipeline-config migration preview.

Pure spec-level transformation — no pipeline is created and no Spark is
involved, mirroring the reference's migrate-pipeline-preview endpoint
(glassflow-api/internal/api/migrate_preview.go:37-85; v2 wire structs
at api/pipeline.go:48-196, v3 at api/pipeline.go:199-330):

- one v3 source per v2 ``source.topics[]`` entry (``id`` falls back to
  the topic name), schema fields split out of the global v2
  ``schema.fields`` by source_id, Kafka connection params copied to
  every source;
- per-topic dedup blocks, the global filter, and the stateless
  transformation become the v3 ``transforms[]`` list (dedup -> filter
  -> stateless, the reference's emission order);
- join sources are re-keyed by orientation into left_source /
  right_source; v2 schema fields become join output_fields
  (column_name -> output_name);
- sink connection params prefer the nested ``connection_params`` block
  over the older flat fields; the v2 base64-encoded password is
  decoded back to plaintext (migrate_preview.go:252-262);
- schema fields referenced by transform expressions but missing from
  the declared schema are supplemented (migrate_preview.go:305-334).
  Identifier extraction uses this package's expr parser; unlike the
  reference's ast.Walk (which also visits expr-lang call *callee*
  identifiers, supplementing phantom fields named after functions),
  our Call nodes hold the function name out-of-band, so only real
  value identifiers are supplemented.
"""

from __future__ import annotations

import base64
import json
from typing import Any

from ..expr import parser as _ep
from .model import SpecError


def _topic_source_id(topic: dict) -> str:
    return topic.get("id") or topic.get("name", "")


def _first_source_id(v2: dict) -> str:
    topics = (v2.get("source") or {}).get("topics") or []
    return _topic_source_id(topics[0]) if topics else ""


def _expr_identifiers(expression: str) -> list[str]:
    """Root value identifiers of an expr-lang expression, in first-seen
    order (migrate_preview.go:337-372). 'a.b' contributes 'a'."""
    try:
        tree = _ep.parse(expression)
    except Exception:  # noqa: BLE001 — unparseable exprs supplement nothing
        return []
    seen: dict[str, None] = {}

    def walk(node) -> None:
        if isinstance(node, _ep.Ident):
            seen.setdefault(node.name.split(".")[0], None)
        elif isinstance(node, _ep.Member):
            walk(node.obj)
        elif isinstance(node, _ep.Index):
            walk(node.obj)
            walk(node.index)
        elif isinstance(node, _ep.Slice):
            walk(node.obj)
            if node.start is not None:
                walk(node.start)
            if node.stop is not None:
                walk(node.stop)
        elif isinstance(node, _ep.Call):
            for a in node.args:
                walk(a)
        elif isinstance(node, _ep.Unary):
            walk(node.operand)
        elif isinstance(node, _ep.Binary):
            walk(node.left)
            walk(node.right)
        elif isinstance(node, _ep.Ternary):
            walk(node.cond)
            walk(node.then)
            walk(node.other)
        elif isinstance(node, _ep.ArrayLit):
            for a in node.items:
                walk(a)
        elif isinstance(node, _ep.MapLit):
            for _, v in node.items:
                walk(v)

    walk(tree)
    return list(seen)


def _supplement_fields(fields: list[dict], transforms: list[dict]) -> list[dict]:
    """Add fields referenced in transform expressions but missing from
    the declared schema (migrate_preview.go:305-334)."""
    fields = list(fields)
    known = {f["name"] for f in fields}
    output_type = {t.get("output_name", ""): t.get("output_type", "") for t in transforms}
    for t in transforms:
        for name in _expr_identifiers(t.get("expression", "")):
            if name in known:
                continue
            typ = output_type.get(name) or t.get("output_type", "")
            fields.append({"name": name, "type": typ})
            known.add(name)
    return fields


def _decode_b64_password(p: str) -> str:
    """v2 stored the CH password base64-encoded; v3 expects plaintext.
    Not-base64 input passes through (migrate_preview.go:252-262)."""
    if not p:
        return p
    try:
        return base64.b64decode(p, validate=True).decode("utf-8")
    except Exception:  # noqa: BLE001 — already plaintext
        return p


def _convert_sources(v2: dict) -> list[dict]:
    src_block = v2.get("source") or {}
    schema_fields = (v2.get("schema") or {}).get("fields") or []
    stateless = v2.get("stateless_transformation") or {}
    conn = src_block.get("connection_params")
    out = []
    for t in src_block.get("topics") or []:
        sid = _topic_source_id(t)
        fields = [
            {"name": f["name"], "type": f.get("type", "")}
            for f in schema_fields
            if f.get("source_id") == sid
        ]
        if stateless.get("enabled"):
            fields = _supplement_fields(
                fields, (stateless.get("config") or {}).get("transform") or []
            )
        s: dict[str, Any] = {
            "type": src_block.get("type", ""),
            "source_id": sid,
            "topic": t.get("name", ""),
        }
        if t.get("consumer_group_initial_offset"):
            s["consumer_group_initial_offset"] = t["consumer_group_initial_offset"]
        if t.get("schema_version"):
            s["schema_version"] = t["schema_version"]
        if fields:
            s["schema_fields"] = fields
        sr = t.get("schema_registry") or {}
        if sr.get("url"):
            s["schema_registry"] = {
                "url": sr["url"],
                "api_key": sr.get("api_key", ""),
                "api_secret": sr.get("api_secret", ""),
            }
        if conn:
            s["connection_params"] = dict(conn)
        out.append(s)
    return out


def _convert_transforms(v2: dict) -> list[dict]:
    transforms: list[dict] = []
    for t in (v2.get("source") or {}).get("topics") or []:
        dd = t.get("deduplication") or {}
        if not dd.get("enabled"):
            continue
        transforms.append(
            {
                "type": "dedup",
                "source_id": _topic_source_id(t),
                "config": {
                    # older v2 used id_field instead of key
                    "key": dd.get("key") or dd.get("id_field", ""),
                    "time_window": dd.get("time_window", ""),
                },
            }
        )
    filt = v2.get("filter") or {}
    if filt.get("enabled"):
        transforms.append(
            {
                "type": "filter",
                "source_id": _first_source_id(v2),
                "config": {"expression": filt.get("expression", "")},
            }
        )
    stateless = v2.get("stateless_transformation") or {}
    if stateless.get("enabled"):
        transforms.append(
            {
                "type": "stateless",
                "source_id": stateless.get("source_id") or _first_source_id(v2),
                "config": {
                    "transforms": (stateless.get("config") or {}).get("transform") or []
                },
            }
        )
    return transforms


def _convert_join(v2: dict) -> dict:
    j = v2.get("join") or {}
    left = right = None
    for s in j.get("sources") or []:
        if s.get("orientation") == "left":
            left = s
        elif s.get("orientation") == "right":
            right = s
    if left is None or right is None:
        found = sum(x is not None for x in (left, right))
        raise SpecError(
            "join requires exactly one left and one right source, "
            f"found {found} oriented sources"
        )

    def _jsrc(s: dict) -> dict:
        return {
            "source_id": s.get("source_id", ""),
            "key": s.get("join_key", ""),
            "time_window": s.get("time_window", ""),
        }

    output_fields = []
    for f in (v2.get("schema") or {}).get("fields") or []:
        of = {"source_id": f.get("source_id", ""), "name": f.get("name", "")}
        if f.get("column_name"):
            of["output_name"] = f["column_name"]
        output_fields.append(of)
    return {
        "enabled": True,
        "type": j.get("type", ""),
        "left_source": _jsrc(left),
        "right_source": _jsrc(right),
        "output_fields": output_fields,
    }


def _sink_conn_params(sink: dict) -> dict:
    cp = sink.get("connection_params") or {}
    if any(cp.values()):
        return cp
    return {
        "host": sink.get("host", ""),
        "port": sink.get("port", ""),
        "http_port": sink.get("http_port", ""),
        "database": sink.get("database", ""),
        "username": sink.get("username", ""),
        "password": sink.get("password", ""),
        "secure": sink.get("secure", False),
        "skip_certificate_verification": sink.get("skip_certificate_verification", False),
    }


def _convert_sink(v2: dict) -> dict:
    sink = v2.get("sink") or {}
    cp = _sink_conn_params(sink)
    # explicit 'mapping' (newer v2) wins; else schema fields carrying a
    # column_name (migrate_preview.go:283-303)
    mapping = [
        {
            "name": m.get("name", ""),
            "column_name": m.get("column_name", ""),
            "column_type": m.get("column_type", ""),
        }
        for m in sink.get("mapping") or []
    ]
    if not mapping:
        mapping = [
            {
                "name": f["name"],
                "column_name": f["column_name"],
                "column_type": f.get("column_type", ""),
            }
            for f in (v2.get("schema") or {}).get("fields") or []
            if f.get("column_name")
        ]
    return {
        "type": sink.get("type", ""),
        "connection_params": {
            "host": cp.get("host", ""),
            "port": cp.get("port", ""),
            "http_port": cp.get("http_port", ""),
            "database": cp.get("database", ""),
            "username": cp.get("username", ""),
            "password": _decode_b64_password(cp.get("password", "")),
            "secure": cp.get("secure", False),
            "skip_certificate_verification": cp.get(
                "skip_certificate_verification", False
            ),
        },
        "table": sink.get("table", ""),
        "max_batch_size": sink.get("max_batch_size", 0),
        "max_delay_time": sink.get("max_delay_time", ""),
        "mapping": mapping,
    }


def convert_v2_to_v3(v2: str | dict) -> dict:
    """Convert a v2 pipeline JSON document to the v3 format. Pure
    transformation — accepts raw/dict input, returns the v3 dict
    (feedable straight into ``parse_pipeline_json``)."""
    if isinstance(v2, str):
        try:
            v2 = json.loads(v2)
        except json.JSONDecodeError as e:
            raise SpecError(f"invalid v2 pipeline JSON: {e}") from e
    out: dict[str, Any] = {
        "version": "v3",
        "pipeline_id": v2.get("pipeline_id", ""),
        "name": v2.get("name", ""),
        "sources": _convert_sources(v2),
        "transforms": _convert_transforms(v2),
        "sink": _convert_sink(v2),
    }
    if v2.get("metadata"):
        out["metadata"] = v2["metadata"]
    if (v2.get("join") or {}).get("enabled"):
        out["join"] = _convert_join(v2)
    return out
