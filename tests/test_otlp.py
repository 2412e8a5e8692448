"""OTLP flattener golden tests (FIXTURES.md F5-F7 shapes)."""

import json

LOGS_REQ = {
    "resourceLogs": [
        {
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "checkout"}},
                {"key": "replicas", "value": {"intValue": "3"}},
            ]},
            "scopeLogs": [
                {
                    "scope": {"name": "applog", "version": "1.2", "attributes": []},
                    "logRecords": [
                        {
                            "timeUnixNano": "1704067200000000000",
                            "observedTimeUnixNano": "1704067201000000000",
                            "severityNumber": 9,
                            "severityText": "INFO",
                            "body": {"stringValue": "user logged in"},
                            "traceId": "abc123",
                            "spanId": "def456",
                            "flags": 1,
                            "attributes": [
                                {"key": "ok", "value": {"boolValue": True}},
                                {"key": "ratio", "value": {"doubleValue": 0.5}},
                            ],
                        },
                        {"timeUnixNano": "1704067202000000000", "body": {"stringValue": "second"}},
                    ],
                }
            ],
        }
    ]
}

TRACES_REQ = {
    "resourceSpans": [
        {
            "resource": {"attributes": [{"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeSpans": [
                {
                    "scope": {"name": "tracer", "version": "1", "attributes": []},
                    "spans": [
                        {
                            "traceId": "t1", "spanId": "s1", "parentSpanId": "",
                            "name": "GET /x", "kind": 2,
                            "startTimeUnixNano": "1704067200000000000",
                            "endTimeUnixNano": "1704067200500000000",
                            "status": {"code": 2, "message": "boom"},
                            "events": [
                                {"timeUnixNano": "1704067200100000000", "name": "ev1",
                                 "attributes": [{"key": "k", "value": {"stringValue": "v"}}]}
                            ],
                            "links": [],
                        }
                    ],
                }
            ],
        }
    ]
}

METRICS_REQ = {
    "resourceMetrics": [
        {
            "resource": {"attributes": [{"key": "host", "value": {"stringValue": "h1"}}]},
            "scopeMetrics": [
                {
                    "scope": {"name": "meter", "version": "1", "attributes": []},
                    "metrics": [
                        {"name": "cpu", "unit": "1",
                         "gauge": {"dataPoints": [
                             {"timeUnixNano": "1704067200000000000", "asDouble": 0.75}]}},
                        {"name": "requests", "unit": "1",
                         "sum": {"aggregationTemporality": 2, "isMonotonic": True,
                                 "dataPoints": [
                                     {"timeUnixNano": "1704067200000000000", "asInt": "42"}]}},
                        {"name": "latency", "unit": "ms",
                         "histogram": {"aggregationTemporality": 2, "dataPoints": [
                             {"timeUnixNano": "1704067200000000000", "count": "10",
                              "sum": 123.5, "min": 1.0, "max": 50.0,
                              "bucketCounts": ["1", "4", "5"],
                              "explicitBounds": [10.0, 25.0]}]}},
                        # exp-histogram: scale/zeroCount/positive runs are
                        # present in the wire payload but dropped by the
                        # flattener (models/otlp.go:134-157 has no fields);
                        # max absent -> null
                        {"name": "latency_exp", "unit": "ms",
                         "exponentialHistogram": {"aggregationTemporality": 1,
                             "dataPoints": [
                                 {"timeUnixNano": "1704067200000000000",
                                  "count": "6", "sum": 44.25, "min": 0.5,
                                  "scale": 3, "zeroCount": "2",
                                  "positive": {"offset": 1,
                                               "bucketCounts": ["1", "5"]}}]}},
                        # summary: quantileValues dropped, no temporality
                        {"name": "rpc_summary", "unit": "s",
                         "summary": {"dataPoints": [
                             {"timeUnixNano": "1704067200000000000",
                              "count": "9", "sum": 7.5,
                              "quantileValues": [
                                  {"quantile": 0.5, "value": 0.8}]}]}},
                    ],
                }
            ],
        }
    ]
}


def _payload_df(spark, req):
    return spark.createDataFrame([(json.dumps(req),)], ["value"])


def test_flatten_logs(spark):
    from clickhouse_etl_spark.sources.otlp import flatten_logs

    out = flatten_logs(_payload_df(spark, LOGS_REQ)).collect()
    assert len(out) == 2
    r = next(x for x in out if x["body"] == "user logged in")
    assert r["timestamp"] == "2024-01-01 00:00:00.000000"
    assert r["observed_timestamp"] == "2024-01-01 00:00:01.000000"
    assert r["severity_number"] == 9 and r["severity_text"] == "INFO"
    assert r["resource_attributes"] == {"service.name": "checkout", "replicas": "3"}
    # bool -> 'true', integral double -> '%g' style (models/otlp.go attr rules)
    assert r["attributes"] == {"ok": "true", "ratio": "0.5"}
    assert r["scope_name"] == "applog"
    # second record: defaults fill absent fields
    r2 = next(x for x in out if x["body"] == "second")
    assert r2["severity_number"] == 0 and r2["trace_id"] == ""
    assert r2["attributes"] == {}


def test_flatten_traces(spark):
    from clickhouse_etl_spark.sources.otlp import flatten_traces

    out = flatten_traces(_payload_df(spark, TRACES_REQ)).collect()
    assert len(out) == 1
    s = out[0]
    assert s["kind"] == "SPAN_KIND_SERVER"
    assert s["status_code"] == "ERROR" and s["status_message"] == "boom"
    assert s["duration_ns"] == 500000000
    assert s["events"][0]["name"] == "ev1"
    assert s["events"][0]["attributes"] == {"k": "v"}
    assert s["links"] == []
    assert s["resource_attributes"] == {"service.name": "api"}


def test_flatten_metrics(spark):
    from clickhouse_etl_spark.sources.otlp import flatten_metrics

    out = flatten_metrics(_payload_df(spark, METRICS_REQ)).collect()
    by_type = {r["metric_type"]: r for r in out}
    assert set(by_type) == {"gauge", "sum", "histogram", "exp_histogram", "summary"}
    assert by_type["gauge"]["value_double"] == 0.75
    assert by_type["gauge"]["value_int"] is None
    assert by_type["sum"]["value_int"] == 42
    assert by_type["sum"]["is_monotonic"] is True
    h = by_type["histogram"]
    assert h["count"] == 10 and h["sum"] == 123.5
    assert h["bucket_counts"] == [1, 4, 5]
    assert h["explicit_bounds"] == [10.0, 25.0]
    assert h["resource_attributes"] == {"host": "h1"}
    eh = by_type["exp_histogram"]
    assert eh["metric_name"] == "latency_exp"
    assert eh["aggregation_temporality"] == "1"
    assert eh["count"] == 6 and eh["sum"] == 44.25
    assert eh["min"] == 0.5 and eh["max"] is None  # max absent in payload
    # reference record carries no exp-histogram bucket structure
    assert eh["bucket_counts"] is None and eh["explicit_bounds"] is None
    sm = by_type["summary"]
    assert sm["metric_name"] == "rpc_summary"
    assert sm["aggregation_temporality"] is None
    assert sm["count"] == 9 and sm["sum"] == 7.5
    assert sm["min"] is None and sm["max"] is None
    assert sm["bucket_counts"] is None
