"""Telemetry: spans + metrics (SURVEY §5 observability; the reference
r0vm initializes OTel tracing + an OTLP metrics pipeline per process,
r0vm/src/actors/mod.rs:39-46)."""

import json
import threading

import pytest

from risc0_tpu import telemetry


@pytest.fixture(autouse=True)
def _clean():
    telemetry.tracer().reset()
    telemetry.metrics().reset()
    yield
    telemetry.tracer().reset()
    telemetry.metrics().reset()


def test_span_nesting_links_parent():
    tr = telemetry.tracer()
    with tr.span("outer", job=1):
        with tr.span("inner"):
            pass
    inner = tr.finished("inner")[0]
    outer = tr.finished("outer")[0]
    assert inner.trace_id == outer.trace_id
    assert inner.parent_id == outer.span_id
    assert outer.parent_id is None
    assert outer.end_ns >= inner.end_ns > 0


def test_span_cross_thread_propagation():
    """A worker thread parents its span to the submitting job's ctx —
    the Task.trace_ctx mechanism."""
    tr = telemetry.tracer()
    got = {}

    def worker(ctx):
        with tr.span("task", parent=ctx):
            pass
        got["ctx"] = ctx

    with tr.span("job") as sp:
        t = threading.Thread(target=worker, args=(tr.ctx(),))
        t.start()
        t.join()
        job_span_id = sp.span.span_id
    task = tr.finished("task")[0]
    assert task.parent_id == job_span_id


def test_span_error_status_and_otlp_shape(tmp_path, monkeypatch):
    monkeypatch.setenv("RISC0_TPU_OTLP", str(tmp_path / "spans.jsonl"))
    telemetry.tracer().reset()  # pick up the sink
    tr = telemetry.tracer()
    with pytest.raises(ValueError):
        with tr.span("boom", n=3):
            raise ValueError("nope")
    s = tr.finished("boom")[0]
    assert s.status == "ERROR"
    line = (tmp_path / "spans.jsonl").read_text().strip()
    otlp = json.loads(line)
    span = otlp["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert span["name"] == "boom"
    assert span["status"]["code"] == 2
    assert {"key": "n", "value": {"intValue": "3"}} in span["attributes"]
    rattrs = otlp["resourceSpans"][0]["resource"]["attributes"]
    assert rattrs[0]["key"] == "service.name"


def test_metrics_counters_and_histograms():
    mx = telemetry.metrics()
    mx.inc("risc0_tasks_submitted", kind="lift")
    mx.inc("risc0_tasks_submitted", kind="lift")
    mx.observe("risc0_task_run_seconds", 0.3, kind="lift", status="ok")
    snap = mx.snapshot()
    assert snap["counters"]["risc0_tasks_submitted{kind=lift}"] == 2
    h = snap["histograms"]["risc0_task_run_seconds{kind=lift,status=ok}"]
    assert h["count"] == 1 and abs(h["sum"] - 0.3) < 1e-9
    text = mx.expose()
    assert 'risc0_tasks_submitted{kind="lift"} 2' in text
    assert 'le="0.5"' in text and "_count" in text


def test_scheduler_emits_spans_and_metrics():
    """A DevModeProver ProofJob produces a root proof_job span with task
    spans parented to it, plus queue/run histograms per kind."""
    from risc0_tpu.parallel.scheduler import (Factory, ProofJob,
                                              make_local_pools)
    from risc0_tpu.zkvm.exec import ExecutorEnv
    from risc0_tpu.zkvm.prover import DevModeProver

    elf = open("guests/loop.bin", "rb").read()
    factory = Factory()
    prover = DevModeProver()
    workers = make_local_pools(factory, prover)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (200000).to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, elf, receipt_kind="succinct")
        _session, receipt = job.run()
        assert receipt is not None
    finally:
        for w in workers:
            w.stop()

    tr = telemetry.tracer()
    root = tr.finished("proof_job")[0]
    exec_spans = tr.finished("task:execute")
    assert exec_spans, "no execute task span"
    assert all(s.trace_id == root.trace_id for s in exec_spans)
    assert any(s.parent_id == root.span_id for s in exec_spans)
    lift_spans = tr.finished("task:lift")
    assert lift_spans and lift_spans[0].trace_id == root.trace_id

    snap = telemetry.metrics().snapshot()
    assert snap["counters"].get("risc0_jobs_completed{kind=succinct}") == 1
    assert any(k.startswith("risc0_task_queue_seconds")
               for k in snap["histograms"])
    assert any(k.startswith("risc0_task_run_seconds{kind=execute")
               for k in snap["histograms"])


def test_api_server_metrics_endpoint(tmp_path):
    import http.client

    from risc0_tpu.zkvm.api_server import serve

    telemetry.metrics().inc("risc0_jobs_completed", kind="succinct")
    srv = serve(port=0, storage=str(tmp_path))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/metrics")
        r = conn.getresponse()
        body = r.read().decode()
        assert r.status == 200
        assert 'risc0_jobs_completed{kind="succinct"}' in body
        conn.request("GET", "/spans")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert "spans" in json.loads(r2.read())
    finally:
        srv.shutdown()
