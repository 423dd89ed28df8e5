"""Serving CLI (cli/serve.py): live HTTP round trips on a real socket.

The server wraps InferenceEngine (itself parity-tested in
test_inference.py); these tests pin the HTTP contract: warmup, healthz,
generate round trips (png + npy), determinism of noise='zeros',
request validation, and concurrent clients through the device lock.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.test_inference import _make_reference_checkpoint


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    tmp_path = tmp_path_factory.mktemp("serve")
    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "1",
         "--max_graphs", "4"])
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(args, ready),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=120), "server failed to start"
    httpd = ready.httpd
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()


def _ref_semantics():
    from sg2im_tpu.ckpt.torch_compat import torch04_semantics

    return torch04_semantics()


def _post(base, payload, path="/generate"):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


SG = {"objects": ["sheep", "grass"], "relationships": [[0, "by", 1]]}


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["image_size"] == [32, 32]


def test_generate_png_roundtrip(server):
    out = _post(server, {"scene_graphs": [SG], "noise": "zeros"})
    assert len(out["images"]) == 1
    from PIL import Image

    png = base64.b64decode(out["images"][0])
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == tuple(out["shape"]) == (32, 32, 3)
    boxes = np.asarray(out["boxes"])
    # Exactly one box per NAMED object — pads and __image__ trimmed, so
    # the shape depends only on the client's own graph.
    assert boxes.shape == (1, 2, 4)
    assert out["latency_ms"] > 0


def test_generate_zeros_deterministic_npy(server):
    a = _post(server, {"scene_graphs": [SG, SG], "noise": "zeros",
                       "return": "npy"})
    b = _post(server, {"scene_graphs": [SG, SG], "noise": "zeros",
                       "return": "npy"})
    assert a["images"] == b["images"]  # byte-identical
    raw = base64.b64decode(a["images"][0])
    img = np.frombuffer(raw, np.uint8).reshape(a["shape"])
    assert img.shape == (32, 32, 3)
    # both graphs identical -> identical renders
    assert a["images"][0] == a["images"][1]


def test_generate_seeded_noise_changes_output(server):
    a = _post(server, {"scene_graphs": [SG], "seed": 1, "return": "npy"})
    b = _post(server, {"scene_graphs": [SG], "seed": 2, "return": "npy"})
    aa = _post(server, {"scene_graphs": [SG], "seed": 1, "return": "npy"})
    assert a["images"] != b["images"]
    assert a["images"] == aa["images"]


def test_request_validation(server):
    for bad in [
        {},                                           # missing graphs
        {"scene_graphs": []},                         # empty
        {"scene_graphs": [SG] * 5},                   # > --max_graphs 4
        {"scene_graphs": [SG], "noise": "sideways"},  # bad noise
        {"scene_graphs": [SG], "return": "bmp"},      # bad format
        {"scene_graphs": [SG], "seed": {"a": 1}},     # unintable seed
        [1, 2],                                       # non-dict body
        "hello",                                      # string body
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, bad)
        assert exc.value.code == 400
        assert "error" in json.loads(exc.value.read())
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, {"scene_graphs": [SG]}, path="/nope")
    assert exc.value.code == 404


def test_unknown_object_name_is_client_error_not_crash(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, {"scene_graphs": [
            {"objects": ["not-in-vocab"], "relationships": []}]})
    assert exc.value.code == 400  # encoding errors are the client's
    assert "error" in json.loads(exc.value.read())
    # server still healthy afterwards
    out = _post(server, {"scene_graphs": [SG], "noise": "zeros"})
    assert len(out["images"]) == 1


def test_unpinned_random_noise_varies_per_request(server):
    a = _post(server, {"scene_graphs": [SG], "return": "npy"})
    b = _post(server, {"scene_graphs": [SG], "return": "npy"})
    assert a["seed"] != b["seed"]
    assert a["images"] != b["images"]
    # the reported seed reproduces the image when pinned
    c = _post(server, {"scene_graphs": [SG], "return": "npy",
                       "seed": a["seed"]})
    assert c["images"] == a["images"]


def test_query_strings_are_ignored_in_routing(server):
    with urllib.request.urlopen(server + "/healthz?probe=1",
                                timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    out = _post(server, {"scene_graphs": [SG], "noise": "zeros"},
                path="/generate?trace=1")
    assert len(out["images"]) == 1


@pytest.fixture(scope="module")
def batch_server(tmp_path_factory):
    """Server with request coalescing enabled (--batch_window_ms)."""
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    tmp_path = tmp_path_factory.mktemp("serve_batch")
    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "1",
         "--max_graphs", "8", "--batch_window_ms", "200"])
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(args, ready),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=120), "server failed to start"
    httpd = ready.httpd
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _healthz(base):
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        return json.loads(r.read())


def test_batcher_coalesces_concurrent_requests(batch_server):
    h0 = _healthz(batch_server)
    results, errs = [], []

    def hit(seed, n_graphs=1):
        try:
            results.append((seed, n_graphs, _post(batch_server, {
                "scene_graphs": [SG] * n_graphs, "seed": seed,
                "return": "npy"})))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    # Mix single- and multi-graph requests: a 3-graph request's pinned
    # seed must draw the same noise rows whether coalesced or solo
    # (jax_threefry_partitionable row stability).
    threads = [threading.Thread(target=hit, args=(s, 3 if s == 2 else 1))
               for s in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and len(results) == 5
    h1 = _healthz(batch_server)
    made = h1["engine_calls"] - h0["engine_calls"]
    assert made < 5, f"no coalescing happened ({made} calls for 5 reqs)"
    assert h1["batched_requests"] > h0["batched_requests"]

    # Per-request seeds survive batching: re-request each seed solo and
    # compare images (uint8; bucket-size differences allow ±1 LSB).
    for seed, n_graphs, r in results:
        solo = _post(batch_server, {"scene_graphs": [SG] * n_graphs,
                                    "seed": seed, "return": "npy"})
        assert len(r["images"]) == n_graphs
        for j in range(n_graphs):
            a = np.frombuffer(base64.b64decode(r["images"][j]), np.uint8)
            b = np.frombuffer(base64.b64decode(solo["images"][j]),
                              np.uint8)
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # Different seeds produced different images inside the batch.
    by_seed = {s: r for s, n, r in results}
    a = base64.b64decode(by_seed[0]["images"][0])
    b = base64.b64decode(by_seed[1]["images"][0])
    assert a != b


def test_batcher_isolates_bad_requests(batch_server):
    codes, oks = [], []

    def bad():
        try:
            _post(batch_server, {"scene_graphs": [
                {"objects": ["not-in-vocab"], "relationships": []}]})
        except urllib.error.HTTPError as e:
            codes.append(e.code)

    def good():
        oks.append(_post(batch_server, {"scene_graphs": [SG],
                                        "noise": "zeros"}))

    threads = [threading.Thread(target=bad)] + [
        threading.Thread(target=good) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert codes == [400]
    assert len(oks) == 2 and all(len(o["images"]) == 1 for o in oks)


def test_mesh_sharded_server_roundtrip(tmp_path):
    """--data_parallel N: the server's engine shards generation batches
    over the ('data','model') mesh (8 virtual CPU devices in tests);
    responses must be well-formed and internally consistent on zero
    noise (mesh-vs-single-device numeric equality is pinned separately
    in test_parallel.py / test_engine_sharded_generation)."""
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "2",
         "--data_parallel", "2"])
    ready = threading.Event()
    threading.Thread(target=serve_forever, args=(args, ready),
                     daemon=True).start()
    assert ready.wait(timeout=120)
    base = f"http://127.0.0.1:{ready.httpd.server_address[1]}"
    try:
        out = _post(base, {"scene_graphs": [SG, SG], "noise": "zeros",
                           "return": "npy"})
        assert len(out["images"]) == 2
        assert out["images"][0] == out["images"][1]  # identical graphs
        assert np.asarray(out["boxes"]).shape == (2, 2, 4)
    finally:
        ready.httpd.shutdown()


def test_mesh_plus_coalescing_combined(tmp_path):
    """--data_parallel with --batch_window_ms: coalesced batches shard
    over the mesh; concurrent requests still come back correct."""
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "2",
         "--data_parallel", "2", "--batch_window_ms", "200",
         "--max_graphs", "8"])
    ready = threading.Event()
    threading.Thread(target=serve_forever, args=(args, ready),
                     daemon=True).start()
    assert ready.wait(timeout=120)
    base = f"http://127.0.0.1:{ready.httpd.server_address[1]}"
    try:
        h0 = _healthz(base)
        results, errs = [], []

        def hit(seed):
            try:
                results.append(_post(base, {
                    "scene_graphs": [SG], "seed": seed, "return": "npy"}))
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=hit, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs and len(results) == 4
        h1 = _healthz(base)
        assert h1["engine_calls"] - h0["engine_calls"] < 4
        for r in results:
            img = np.frombuffer(base64.b64decode(r["images"][0]), np.uint8)
            assert img.reshape(r["shape"]).shape == (32, 32, 3)
    finally:
        ready.httpd.shutdown()


def test_build_engine_flag_mapping(tmp_path):
    """--bf16/--dense_precision/--crn_mode/--deprocess_on_device flags
    map onto the InferenceEngine configuration."""
    import jax.numpy as jnp

    from sg2im_tpu.cli.serve import build_engine, build_parser

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--bf16", "1", "--dense_precision", "high",
         "--crn_mode", "split", "--deprocess_on_device", "0",
         "--quantize", "int8", "--noise_impl", "rbg"])
    engine = build_engine(args)
    assert engine.model_kwargs["compute_dtype"] == jnp.bfloat16
    assert engine.model_kwargs["dense_precision"] == "high"
    assert engine.model_kwargs["crn_mode"] == "split"
    assert engine.model_kwargs["crn_quant"] == "int8"
    # the adopted default band travels through the CLI untouched
    assert engine.model_kwargs["crn_quant_max_res"] == 64
    assert engine.noise_impl == "rbg"
    assert engine.deprocess_on_device is False
    # --quantize_max_res 0 = unbounded (the round-4 full band)
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--quantize", "int8",
         "--quantize_max_res", "0"])
    engine = build_engine(args)
    assert "crn_quant_max_res" not in engine.model_kwargs
    # defaults: f32, no overrides, on-device deprocess on
    args = build_parser().parse_args(["--checkpoint", ckpt])
    engine = build_engine(args)
    assert "compute_dtype" not in engine.model_kwargs
    assert "dense_precision" not in engine.model_kwargs
    assert "crn_mode" not in engine.model_kwargs
    assert "crn_quant" not in engine.model_kwargs
    assert engine.noise_impl == "threefry"
    assert engine.deprocess_on_device is True


def test_calibration_file_lifecycle(tmp_path):
    """serve --calibrate_graphs + --save_calibration writes the int8
    scales at startup; a second server restarted with --calibration_file
    loads them and serves byte-identical images for the same request —
    the turbo tier's reproducible-deployment story (no first-traffic
    auto-calibration anywhere)."""
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    graphs = str(tmp_path / "calibration_graphs.json")
    with open(graphs, "w") as f:
        json.dump([SG], f)
    cal = str(tmp_path / "scales.json")

    def spin(extra):
        args = build_parser().parse_args(
            ["--checkpoint", ckpt, "--port", "0", "--warmup", "1",
             "--quantize", "int8"] + extra)
        ready = threading.Event()
        threading.Thread(target=serve_forever, args=(args, ready),
                         daemon=True).start()
        assert ready.wait(timeout=120), "server failed to start"
        return (ready.httpd,
                f"http://127.0.0.1:{ready.httpd.server_address[1]}")

    httpd_a, base_a = spin(["--calibrate_graphs", graphs,
                            "--save_calibration", cal])
    try:
        import os

        assert os.path.exists(cal)  # written at startup, before traffic
        h = _healthz(base_a)
        assert h["int8_calibrated"] is True
        a = _post(base_a, {"scene_graphs": [SG], "seed": 7,
                           "return": "npy"})
    finally:
        httpd_a.shutdown()

    httpd_b, base_b = spin(["--calibration_file", cal])
    try:
        assert _healthz(base_b)["int8_calibrated"] is True
        b = _post(base_b, {"scene_graphs": [SG], "seed": 7,
                           "return": "npy"})
    finally:
        httpd_b.shutdown()
    assert a["images"] == b["images"]  # byte-identical across restart


def test_startup_calibration_flag_validation(tmp_path):
    """The calibration-file flags require the int8 tier and are mutually
    exclusive — validated before any engine work."""
    from sg2im_tpu.cli.serve import build_parser, startup_calibration

    args = build_parser().parse_args(
        ["--checkpoint", "x.pt", "--calibration_file", "c.json"])
    with pytest.raises(SystemExit, match="quantize int8"):
        startup_calibration(args, [])
    args = build_parser().parse_args(
        ["--checkpoint", "x.pt", "--quantize", "int8",
         "--calibration_file", "c.json", "--calibrate_graphs", "g.json"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        startup_calibration(args, [])
    # no calibration flags at all: a silent no-op
    args = build_parser().parse_args(["--checkpoint", "x.pt"])
    assert startup_calibration(args, []) is False


def test_latency_histogram_quantiles():
    """Unit-level: interpolated quantiles land in the right bucket and
    min/max/sum/count are exact."""
    from sg2im_tpu.cli.serve import _LatencyHistogram

    h = _LatencyHistogram()
    assert h.to_json()["count"] == 0 and h.quantile(0.5) == 0.0
    for ms in [3.0] * 50 + [10.0] * 40 + [100.0] * 9 + [5000.0]:
        h.observe(ms)
    j = h.to_json()
    assert j["count"] == 100
    assert j["min_ms"] == 3.0 and j["max_ms"] == 5000.0
    assert abs(j["mean_ms"] - (150 + 400 + 900 + 5000) / 100) < 1e-6
    # p50 falls in the (2,4] bucket, p90 in (8,16], p99 in (64,128]
    assert 2.0 < j["p50_ms"] <= 4.0
    assert 8.0 < j["p90_ms"] <= 16.0
    assert 64.0 < j["p99_ms"] <= 128.0
    # quantiles never exceed the observed max
    assert h.quantile(1.0) <= 5000.0


def test_metrics_endpoint(server):
    # generate once so the histogram is non-empty, and provoke a 400
    _post(server, {"scene_graphs": [SG], "noise": "zeros"})
    with pytest.raises(urllib.error.HTTPError):
        _post(server, {"scene_graphs": []})

    with urllib.request.urlopen(server + "/metrics?format=json",
                                timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1 and m["images"] >= m["requests"]
    assert m["errors"]["400"] >= 1
    lat = m["request_latency_ms"]
    assert lat["count"] >= 1
    assert 0 < lat["p50_ms"] <= lat["p99_ms"] <= lat["max_ms"]

    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert f"sg2im_requests_total {m['requests']}" in text or \
        "sg2im_requests_total" in text  # counters may advance between GETs
    assert 'sg2im_request_latency_ms_bucket{le="+Inf"}' in text
    assert 'sg2im_errors_total{code="400"}' in text
    # cumulative buckets are monotone and end at the count
    cums = [int(line.rsplit(" ", 1)[1]) for line in text.splitlines()
            if line.startswith("sg2im_request_latency_ms_bucket")]
    assert cums == sorted(cums)
    count = int([line for line in text.splitlines()
                 if line.startswith("sg2im_request_latency_ms_count")
                 ][0].rsplit(" ", 1)[1])
    assert cums[-1] == count >= 1


def test_concurrent_clients(server):
    results, errs = [], []

    def hit(seed):
        try:
            results.append(_post(server, {
                "scene_graphs": [SG], "seed": seed, "return": "npy"}))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and len(results) == 6


# -- per-chip replicas (--replicas) ------------------------------------------


def test_replica_server_roundtrip_and_determinism(tmp_path):
    """--replicas 2: requests round-robin across two device-pinned
    engines; same graph+seed must produce byte-identical PNGs from
    EITHER replica (identical program + params per chip), and
    engine_calls counts across all replicas."""
    import jax

    from sg2im_tpu.cli.serve import build_parser, serve_forever

    assert len(jax.devices()) >= 2
    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "1",
         "--max_graphs", "4", "--replicas", "2"])
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(args, ready),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=180), "replica server failed to start"
    base = f"http://127.0.0.1:{ready.httpd.server_address[1]}"
    try:
        # 4 sequential requests alternate replicas (round-robin); the
        # same pinned seed must give identical bytes on both.
        payload = {"scene_graphs": [SG], "noise": "random", "seed": 11}
        imgs = [_post(base, payload)["images"][0] for _ in range(4)]
        assert len(set(imgs)) == 1, "replicas diverged for a pinned seed"
        h = json.loads(urllib.request.urlopen(base + "/healthz",
                                              timeout=30).read())
        # warmup bypasses the batcher; 4 requests -> 4 calls summed
        # across both replicas' batchers.
        assert h["engine_calls"] == 4
        # ... and BOTH replicas actually served (sequential requests see
        # every replica idle, so the dispatcher's rotation decides — a
        # bug routing everything to replica 0 would still sum to 4).
        per_replica = [b.engine_calls for b in ready.state.batcher.batchers]
        assert per_replica == [2, 2], per_replica
    finally:
        ready.httpd.shutdown()


def test_replicas_mutually_exclusive_with_data_parallel(tmp_path):
    from sg2im_tpu.cli.serve import build_engines, build_parser

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--replicas", "2", "--data_parallel", "2"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        build_engines(args)


def test_engine_device_pinning(tmp_path):
    """Library-level: two engines pinned to different devices hold their
    params there and produce identical outputs for identical inputs."""
    import jax

    from sg2im_tpu.inference import InferenceEngine

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    d0, d1 = jax.devices()[0], jax.devices()[1]
    e0 = InferenceEngine.from_torch_checkpoint(ckpt, device=d0)
    e1 = InferenceEngine.from_torch_checkpoint(ckpt, device=d1)
    for e, d in ((e0, d0), (e1, d1)):
        leaf = jax.tree.leaves(e.variables)[0]
        assert leaf.devices() == {d}, (leaf.devices(), d)
    imgs0, out0 = e0.generate([SG], noise=None, seed=5)
    imgs1, out1 = e1.generate([SG], noise=None, seed=5)
    assert list(np.asarray(out0["imgs"]).ravel()) == \
        list(np.asarray(out1["imgs"]).ravel())
    np.testing.assert_array_equal(imgs0, imgs1)


def test_replicas_with_coalescing_window(tmp_path):
    """--replicas 2 + --batch_window_ms: the dispatcher round-robins
    request GROUPS across replicas and each replica coalesces its own
    queue — 6 concurrent requests must produce fewer engine calls than
    requests (coalescing happened) spread over BOTH replicas, with every
    response correct."""
    from sg2im_tpu.cli.serve import build_parser, serve_forever

    with _ref_semantics():
        _, ckpt = _make_reference_checkpoint(str(tmp_path))
    args = build_parser().parse_args(
        ["--checkpoint", ckpt, "--port", "0", "--warmup", "1",
         "--max_graphs", "8", "--replicas", "2",
         "--batch_window_ms", "300"])
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(args, ready),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=180), "server failed to start"
    base = f"http://127.0.0.1:{ready.httpd.server_address[1]}"
    try:
        results, errors = [], []

        def one(i):
            try:
                results.append(_post(
                    base, {"scene_graphs": [SG], "noise": "zeros"}))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(6)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors and len(results) == 6
        # zeros-noise responses are deterministic -> all identical
        assert len({r["images"][0] for r in results}) == 1
        batchers = ready.state.batcher.batchers
        calls = [b.engine_calls for b in batchers]
        assert sum(calls) < 6, f"no coalescing happened: {calls}"
        assert all(c >= 1 for c in calls), \
            f"a replica sat idle under concurrent load: {calls}"
    finally:
        ready.httpd.shutdown()
