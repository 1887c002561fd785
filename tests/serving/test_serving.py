"""Serving stack: MicroBatcher aggregation, ServingEngine bucketing,
and the HTTP server end-to-end (all on CPU; no network egress)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from mmf_tpu.serving.batcher import MicroBatcher
from mmf_tpu.serving.engine import ServingEngine
from mmf_tpu.serving.server import ServingServer


# -- MicroBatcher ---------------------------------------------------------


def test_batcher_correctness_and_aggregation():
    seen_batches = []

    def predict_many(items):
        seen_batches.append(len(items))
        time.sleep(0.02)  # give the queue time to fill behind us
        return [x * 2 for x in items]

    with MicroBatcher(predict_many, max_batch_size=8,
                      max_wait_ms=50) as mb:
        futs = [mb.submit(i) for i in range(20)]
        results = [f.result(timeout=10) for f in futs]
    assert results == [i * 2 for i in range(20)]
    assert sum(seen_batches) == 20
    assert max(seen_batches) > 1, "no aggregation happened"
    assert max(seen_batches) <= 8


def test_batcher_error_propagates_per_batch():
    def predict_many(items):
        raise RuntimeError("boom")

    with MicroBatcher(predict_many, max_batch_size=4,
                      max_wait_ms=1) as mb:
        fut = mb.submit(1)
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)


def test_batcher_stats_and_close():
    mb = MicroBatcher(lambda xs: xs, max_batch_size=4, max_wait_ms=1)
    assert mb.predict(7) == 7
    stats = mb.stats()
    assert stats["requests"] == 1 and stats["batches"] == 1
    assert stats["latency_ms"]["p50"] is not None
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(1)


# -- ServingEngine --------------------------------------------------------


def _linear_apply(variables, batch):
    # toy model: scores = x @ w ; echoes dataset_name length to prove
    # static fields reached the trace
    import jax.numpy as jnp

    x = batch["data"]
    w = variables["w"]
    bonus = float(len(batch.get("dataset_name", "")))
    return {"scores": jnp.dot(x, w) + bonus}


def _make_engine(**kw):
    w = np.eye(3, dtype=np.float32) * 2.0
    return ServingEngine(_linear_apply, {"w": w}, max_batch_size=8, **kw)


def test_engine_bucket_ladder():
    eng = _make_engine()
    assert eng.buckets == (1, 2, 4, 8)
    assert eng._bucket(3) == 4
    assert eng._bucket(8) == 8
    with pytest.raises(ValueError):
        eng._bucket(9)


def test_engine_predict_pads_trims_and_is_exact():
    eng = _make_engine()
    samples = [
        {"data": np.full((3,), i, np.float32), "dataset_name": "serve"}
        for i in range(5)
    ]
    out = eng.predict_many(samples)
    assert len(out) == 5
    for i, o in enumerate(out):
        np.testing.assert_allclose(
            o["scores"], np.full((3,), 2.0 * i) + len("serve")
        )


def test_engine_oversize_batch_splits_into_chunks():
    eng = _make_engine()
    samples = [{"data": np.full((3,), i, np.float32)} for i in range(19)]
    out = eng.predict_many(samples)
    assert len(out) == 19
    np.testing.assert_allclose(out[18]["scores"], np.full((3,), 36.0))


def test_engine_warmup_compiles_every_bucket():
    eng = _make_engine()
    done = eng.warmup({"data": np.zeros((3,), np.float32)})
    assert done == [1, 2, 4, 8]


def test_engine_rejects_mismatched_static_fields():
    eng = _make_engine()
    with pytest.raises(ValueError, match="differs within a batch"):
        eng.predict_many([
            {"data": np.zeros((3,), np.float32), "dataset_name": "a"},
            {"data": np.zeros((3,), np.float32), "dataset_name": "b"},
        ])


def test_engine_postprocess_hook():
    eng = ServingEngine(
        _linear_apply, {"w": np.eye(3, dtype=np.float32)}, max_batch_size=2,
        postprocess=lambda r: float(np.sum(r["scores"])),
    )
    assert eng.predict({"data": np.ones((3,), np.float32)}) == 3.0


# -- HTTP server ----------------------------------------------------------


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as resp:
        return json.loads(resp.read())


def test_http_server_end_to_end():
    eng = _make_engine()
    with ServingServer(eng, port=0, max_wait_ms=10).start() as server:
        port = server.port
        assert _get(port, "/healthz") == {"status": "ok"}

        resp = _post(port, "/v1/predict",
                     {"fields": {"data": [1.0, 0.0, 2.0]}})
        np.testing.assert_allclose(resp["scores"], [2.0, 0.0, 4.0])
        assert resp["label"] == 2
        assert 0 < resp["confidence"] <= 1

        # concurrent requests share device batches
        results = [None] * 12
        def hit(i):
            results[i] = _post(port, "/v1/predict",
                               {"fields": {"data": [float(i), 0.0, 0.0]}})
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, r in enumerate(results):
            np.testing.assert_allclose(r["scores"], [2.0 * i, 0.0, 0.0])

        stats = _get(port, "/v1/stats")
        assert stats["batcher"]["requests"] == 13
        assert stats["engine"]["buckets"] == [1, 2, 4, 8]


def test_http_server_bad_requests():
    eng = _make_engine()
    with ServingServer(eng, port=0).start() as server:
        port = server.port
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/v1/predict", {})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/nope", {})
        assert e.value.code == 404


# -- end-to-end with a registered framework model -------------------------


def test_serve_registered_model_end_to_end():
    """A real BaseModel (registry 'simple_model') behind the full stack:
    engine batch format matches the trainer/inference pipelines'
    (array fields + dataset_name/type statics)."""
    import jax

    import tests.trainer_fixtures  # noqa: F401 — registers simple_model
    from mmf_tpu.common.registry import registry

    model_cls = registry.get_model_class("simple_model")
    model = model_cls(config={"in_dim": 3})
    example = {
        "data": np.ones((3,), np.float32),
        "dataset_name": "numbers",
        "dataset_type": "test",
    }
    batch0 = {
        "data": np.ones((1, 3), np.float32),
        "dataset_name": "numbers",
        "dataset_type": "test",
    }
    variables = model.init(jax.random.PRNGKey(0), batch0, False)

    eng = ServingEngine(
        lambda v, b: model.apply(v, b, False), variables, max_batch_size=4
    )
    eng.warmup(example)
    with ServingServer(eng, port=0, max_wait_ms=5).start() as server:
        resp = _post(server.port, "/v1/predict",
                     {"fields": {"data": [1.0, 2.0, 3.0]}})
        direct = model.apply(
            variables,
            {"data": np.array([[1.0, 2.0, 3.0]], np.float32),
             "dataset_name": "numbers", "dataset_type": "test"},
            False,
        )
        np.testing.assert_allclose(
            resp["scores"], np.asarray(direct["scores"])[0], rtol=1e-6
        )


# -- CLI flag parsing -----------------------------------------------------


def test_cli_parse_opts():
    from mmf_tpu.cli.serve import parse_opts

    cfg = parse_opts(["checkpoint=/tmp/x.ckpt", "port=9000",
                      "max_batch_size=16"])
    assert cfg["checkpoint"] == "/tmp/x.ckpt"
    assert cfg["port"] == "9000"
    with pytest.raises(SystemExit):
        parse_opts(["port=9000"])  # checkpoint required
    with pytest.raises(SystemExit):
        parse_opts(["checkpoint=x", "bogus=1"])


# -- multi-chip serving (8 virtual CPU devices via conftest) --------------


def test_engine_mesh_sharded_serving_matches_single_device():
    """Serving over a dp=2 x tp=4 mesh: variables placed under the TP
    rules, batches sharded on the data axis, outputs identical to the
    unsharded engine. Buckets snap to multiples of the data-axis size."""
    import jax
    from jax.sharding import Mesh

    from mmf_tpu.parallel import mesh as pmesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devices).reshape(2, 4), ("data", "model"))
    pmesh.set_mesh(mesh)

    w = np.asarray(np.random.RandomState(0).randn(16, 8), np.float32)

    def apply_fn(variables, batch):
        import jax.numpy as jnp

        return {"scores": jnp.dot(batch["data"], variables["w"])}

    plain = ServingEngine(apply_fn, {"w": w}, max_batch_size=8)
    sharded = ServingEngine(apply_fn, {"w": w}, max_batch_size=8, mesh=mesh)
    assert sharded.buckets == (2, 4, 8)

    samples = [
        {"data": np.random.RandomState(i).randn(16).astype(np.float32)}
        for i in range(5)
    ]
    out_plain = plain.predict_many(samples)
    out_sharded = sharded.predict_many(samples)
    for a, b in zip(out_plain, out_sharded):
        np.testing.assert_allclose(a["scores"], b["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_engine_from_export_serves_aot_artifact(tmp_path):
    """Export a model forward to StableHLO bytes, reload WITHOUT the
    model code path, and serve it — the AOT deployment flow."""
    import jax

    import tests.trainer_fixtures  # noqa: F401
    from mmf_tpu.common.registry import registry
    from mmf_tpu.utils.export import export_model_forward

    model_cls = registry.get_model_class("simple_model")
    model = model_cls(config={"in_dim": 3})
    example = {
        "data": np.ones((4, 3), np.float32),
        "dataset_name": "numbers",
        "dataset_type": "test",
    }
    variables = model.init(jax.random.PRNGKey(0), example, False)
    blob = export_model_forward(model, variables, example)
    path = tmp_path / "simple_model.stablehlo"
    path.write_bytes(blob)

    eng = ServingEngine.from_export(str(path), variables, buckets=[4])
    samples = [
        {"data": np.full((3,), float(i), np.float32),
         "dataset_name": "numbers", "dataset_type": "test"}
        for i in range(3)
    ]
    out = eng.predict_many(samples)
    direct = model.apply(
        variables,
        {"data": np.stack([s["data"] for s in samples]
                          + [samples[-1]["data"]]),
         "dataset_name": "numbers", "dataset_type": "test"},
        False,
    )
    for i, o in enumerate(out):
        np.testing.assert_allclose(
            o["scores"], np.asarray(direct["scores"])[i], rtol=1e-6
        )


def test_batcher_pipelined_mode_overlaps_and_is_correct():
    """Pipelined batcher: dispatch of batch N+1 must begin before batch
    N finalizes, and every request still gets its own correct result."""
    import queue as queue_mod

    dispatch_order = []
    finalize_gate = threading.Event()

    def predict_many_async(items):
        dispatch_order.append(("dispatch", tuple(items)))

        def finalize():
            if len(dispatch_order) < 2:
                # wait until a second dispatch proves overlap (released
                # below, or by the next dispatch arriving)
                finalize_gate.wait(timeout=5)
            dispatch_order.append(("finalize", tuple(items)))
            return [x * 10 for x in items]

        return finalize

    mb = MicroBatcher(
        lambda xs: [x * 10 for x in xs], max_batch_size=2, max_wait_ms=1,
        predict_many_async=predict_many_async, pipeline_depth=2,
    )
    try:
        futs = [mb.submit(i) for i in range(6)]
        # release the first finalize once >=2 dispatches have happened
        for _ in range(100):
            if len([e for e in dispatch_order if e[0] == "dispatch"]) >= 2:
                break
            time.sleep(0.02)
        finalize_gate.set()
        results = [f.result(timeout=10) for f in futs]
        assert results == [i * 10 for i in range(6)]
        kinds = [k for k, _ in dispatch_order]
        first_final = kinds.index("finalize")
        assert kinds[:first_final].count("dispatch") >= 2, dispatch_order
        stats = mb.stats()
        assert stats["requests"] == 6
    finally:
        mb.close()


def test_batcher_pipelined_error_propagates():
    def predict_many_async(items):
        def finalize():
            raise RuntimeError("finalize boom")
        return finalize

    mb = MicroBatcher(lambda xs: xs, max_batch_size=4, max_wait_ms=1,
                      predict_many_async=predict_many_async)
    try:
        with pytest.raises(RuntimeError, match="finalize boom"):
            mb.predict(1, timeout=10)
    finally:
        mb.close()


def test_http_profile_endpoint(tmp_path):
    eng = _make_engine()
    with ServingServer(eng, port=0).start() as server:
        resp = _post(server.port, "/v1/profile",
                     {"seconds": 0.2, "dir": str(tmp_path / "trace")})
        assert resp["trace_dir"] == str(tmp_path / "trace")
        import os
        found = []
        for root, _, files in os.walk(resp["trace_dir"]):
            found.extend(files)
        assert found, "no trace files captured"


def test_engine_validate_sample_schema():
    """Submit-time schema check: the first sample teaches the schema;
    later malformed requests raise ValueError on their own (the server
    maps that to a 400 for just that request, before batching)."""
    eng = _make_engine()
    good = {"data": np.zeros((3,), np.float32), "dataset_name": "serve"}
    eng.validate_sample(good)          # learns schema
    eng.validate_sample(dict(good))    # same shape passes

    with pytest.raises(ValueError, match="missing field 'data'"):
        eng.validate_sample({"dataset_name": "serve"})
    with pytest.raises(ValueError, match="unexpected field"):
        eng.validate_sample({**good, "extra": np.zeros(2, np.float32)})
    with pytest.raises(ValueError, match="shape"):
        eng.validate_sample(
            {"data": np.zeros((4,), np.float32), "dataset_name": "serve"}
        )
    with pytest.raises(ValueError, match="dict"):
        eng.validate_sample([1, 2, 3])


def test_stack_samples_rejects_key_mismatch_with_index():
    from mmf_tpu.serving.engine import _stack_samples

    with pytest.raises(ValueError, match="sample 1"):
        _stack_samples([
            {"a": np.zeros(2, np.float32)},
            {"b": np.zeros(2, np.float32)},
        ])
