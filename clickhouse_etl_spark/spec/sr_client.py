"""Schema-Registry client + per-source schema tracker.

Reference behavior (glassflow-api/internal/schema_v2/schema.go:14-146,
ingestor/processor.go:178-201): a message carrying an UNKNOWN schema id
triggers a registry fetch; the fetched schema must be backward
compatible with the latest known version — compatible versions are
saved and the stream continues, incompatible ones (or ids the registry
doesn't know) raise and emit a component signal that stops the
pipeline.

Spark mapping: schema-id extraction is plan-side
(schema_registry.strip_sr_envelope); the *tracker* is driver-side
control flow — new ids per micro-batch are a handful of distinct
values, so the check belongs in foreachBatch, not in the row path.
``SchemaTracker.check_batch`` is that hook.

The HTTP client implements the Confluent REST lookup
(``GET /schemas/ids/{id}``, basic auth) with stdlib urllib — no live
registry exists in this environment, so it is exercised against a
stub transport in tests; the wire format is the public Confluent API.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Callable, Optional, Protocol

from .model import Field
from .schema_registry import check_backward_compatible


class SchemaNotFoundError(KeyError):
    """The registry has no schema for this id (models.ErrSchemaNotFound)."""


class IncompatibleSchemaError(ValueError):
    """A fetched schema version is not backward compatible — the
    stop-pipeline signal (models.NewIncompatibleSchemaError)."""

    def __init__(self, schema_id: int, reason: str):
        super().__init__(f"schema id {schema_id} incompatible: {reason}")
        self.schema_id = schema_id
        self.reason = reason


class SchemaRegistryClient(Protocol):
    def get_schema(self, schema_id: int) -> list[Field]: ...


#: Avro primitive -> engine basic type (spec/types.py vocabulary)
_AVRO_TYPES = {
    "string": "string",
    "int": "int",
    "long": "int64",
    "float": "float",
    "double": "float64",
    "boolean": "bool",
    "bytes": "bytes",
}
_JSONSCHEMA_TYPES = {
    "string": "string",
    "integer": "int64",
    "number": "float64",
    "boolean": "bool",
}


def parse_registry_schema(payload: dict) -> list[Field]:
    """Confluent ``/schemas/ids/{id}`` response -> field list.

    ``schemaType`` AVRO (default, record schemas) and JSON (object
    schemas) are supported; nullable unions like ["null","string"]
    take their non-null member.
    """
    schema_type = (payload.get("schemaType") or "AVRO").upper()
    doc = json.loads(payload["schema"])
    fields: list[Field] = []
    if schema_type == "AVRO":
        for f in doc.get("fields", []):
            t = f.get("type")
            if isinstance(t, list):  # nullable union
                t = next((x for x in t if x != "null"), "string")
            if isinstance(t, dict):  # logical/complex type -> base type
                t = t.get("type", "string")
            fields.append(Field(f["name"], _AVRO_TYPES.get(t, "string")))
    elif schema_type == "JSON":
        for name, spec in (doc.get("properties") or {}).items():
            t = spec.get("type", "string")
            if isinstance(t, list):
                t = next((x for x in t if x != "null"), "string")
            fields.append(Field(name, _JSONSCHEMA_TYPES.get(t, "string")))
    else:
        raise ValueError(f"unsupported schemaType {schema_type!r}")
    return fields


@dataclass
class HTTPSchemaRegistryClient:
    """Confluent REST lookup via stdlib urllib (public wire API)."""

    url: str
    api_key: str = ""
    api_secret: str = ""
    timeout_s: float = 10.0
    # injectable transport: (request) -> bytes; real HTTP by default
    _transport: Optional[Callable] = None

    def get_schema(self, schema_id: int) -> list[Field]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.url.rstrip('/')}/schemas/ids/{int(schema_id)}"
        )
        if self.api_key:
            import base64

            tok = base64.b64encode(
                f"{self.api_key}:{self.api_secret}".encode()
            ).decode()
            req.add_header("Authorization", f"Basic {tok}")
        try:
            if self._transport is not None:
                body = self._transport(req)
            else:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    body = resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise SchemaNotFoundError(schema_id) from e
            raise
        return parse_registry_schema(json.loads(body))


@dataclass
class SchemaTracker:
    """Per-source schema version catalog with fetch-on-unknown.

    ``resolve(schema_id)``: known ids return their fields; unknown ids
    fetch from the registry, check backward compatibility against the
    latest known version, and register (schema.go:89-120). Incompatible
    or registry-missing ids raise AND invoke ``signal`` first — the
    reference's ComponentSignal that pauses the pipeline
    (processor.go:180-201); the caller (e.g. PipelineManager.stop)
    owns the actual pause.
    """

    source_id: str
    versions: dict[int, tuple[Field, ...]]
    client: Optional[SchemaRegistryClient] = None
    signal: Optional[Callable[[str, str], None]] = None  # (component, reason)
    _order: list[int] = dc_field(default_factory=list)

    def __post_init__(self):
        self.versions = {k: tuple(v) for k, v in self.versions.items()}
        self._order = sorted(self.versions)

    @property
    def latest(self) -> tuple[Field, ...]:
        return self.versions[self._order[-1]] if self._order else ()

    def _signal(self, reason: str) -> None:
        if self.signal is not None:
            self.signal(f"ingestor:{self.source_id}", reason)

    def resolve(self, schema_id: int) -> tuple[Field, ...]:
        schema_id = int(schema_id)
        if schema_id in self.versions:
            return self.versions[schema_id]
        if self.client is None:
            reason = f"unknown schema id {schema_id} and no registry client"
            self._signal(reason)
            raise SchemaNotFoundError(reason)
        try:
            fetched = tuple(self.client.get_schema(schema_id))
        except SchemaNotFoundError:
            self._signal(f"schema id {schema_id} not found in registry")
            raise
        if not fetched:
            raise ValueError(f"schema id {schema_id} has no fields")
        ok, reason = check_backward_compatible(self.latest, fetched)
        if not ok:
            self._signal(f"schema id {schema_id} validation failed: {reason}")
            raise IncompatibleSchemaError(schema_id, reason)
        self.versions[schema_id] = fetched
        self._order.append(schema_id)
        self._order.sort()
        return fetched

    def check_batch(self, df) -> dict[int, tuple[Field, ...]]:
        """foreachBatch hook: resolve every distinct schema id in the
        micro-batch (a handful of driver-side values — rows never leave
        the executors). Raises on the first incompatible/unknown id,
        failing the epoch before any row is written."""
        ids = [
            r[0]
            for r in df.select("_schema_id").distinct().collect()
            if r[0] is not None
        ]
        return {int(i): self.resolve(int(i)) for i in ids}
