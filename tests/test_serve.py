"""Serving layer (tools/serve.py): micro-batched SR service + HTTP front.

The service wraps the lr_input/protocol overlap pipelines (infer/tiled.py);
these tests pin the request path — shape buckets, batch coalescing, padding
crop-back, exactness vs a direct pipeline call — and the HTTP round-trip,
all CPU-pinned (conftest) with a tiny random-init G."""

import http.client
import io
import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
from dcgan_sr_tpu.train import init_train_state

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.serve import SRService, make_http_server  # noqa: E402

TINY = dict(ngf=4, ndf=8)


@pytest.fixture(scope="module")
def service():
    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=32, max_batch=4,
                    window_ms=30.0)
    yield svc
    svc.close()


def test_true_2x_submit_matches_direct_pipeline(service):
    rng = np.random.RandomState(0)
    img = rng.rand(26, 31).astype(np.float32)          # ragged, needs padding
    out = service.submit(img)                          # default mode: 2x
    assert out.shape == (52, 62)

    b = service.buckets[0]
    padded = np.pad(img, ((0, b - 26), (0, b - 31)), mode="edge")
    direct = make_overlap_sr_fn(service.cfg, fine=(2 * b, 2 * b),
                                lr_input=True, bn_eval=True)(
        service.g_params, service.g_state, jnp.asarray(padded)[None])
    np.testing.assert_allclose(out, np.asarray(direct["seam"])[0, :52, :62],
                               atol=1e-6)


def test_restore_mode_same_size(service):
    img = np.random.RandomState(1).rand(64, 64).astype(np.float32)
    out = service.submit(img, mode="restore")
    assert out.shape == (64, 64)
    assert np.isfinite(out).all()


def test_concurrent_requests_coalesce_into_batches(service):
    imgs = [np.random.RandomState(i).rand(32, 32).astype(np.float32)
            for i in range(4)]
    b0 = service.stats["batches"]
    results = [None] * 4

    def post(i):
        results[i] = service.submit(imgs[i])

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r.shape == (64, 64) for r in results)
    # 4 concurrent requests within the window must need fewer dispatches
    assert service.stats["batches"] - b0 < 4
    # batching must not change per-request results (bn_eval independence)
    solo = service.submit(imgs[2])
    np.testing.assert_allclose(results[2], solo, atol=1e-6)


def test_mixed_size_requests_coalesce_exactly(service):
    """Different-size images coalescing into ONE dispatch each get their own
    edge padding to the common bucket and crop-back — each result is exact
    vs running that image alone through the bucket's pipeline."""
    rng = np.random.RandomState(40)
    a = rng.rand(16, 16).astype(np.float32)
    b = rng.rand(10, 14).astype(np.float32)
    results = {}

    def post(key, img):
        results[key] = service.submit(img)

    threads = [threading.Thread(target=post, args=(k, im))
               for k, im in (("a", a), ("b", b))]
    n_batches = service.stats["batches"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"].shape == (32, 32)
    assert results["b"].shape == (20, 28)
    assert service.stats["batches"] == n_batches + 1   # ONE dispatch
    bh, bw = service.bucket_for(16, 16)
    for img, key in ((a, "a"), (b, "b")):
        padded = np.pad(img, ((0, bh - img.shape[0]), (0, bw - img.shape[1])),
                        mode="edge")
        direct = make_overlap_sr_fn(service.cfg, fine=(2 * bh, 2 * bw),
                                    lr_input=True, bn_eval=True)(
            service.g_params, service.g_state, jnp.asarray(padded)[None])
        oh, ow = results[key].shape
        np.testing.assert_allclose(
            results[key], np.asarray(direct["seam"])[0, :oh, :ow], atol=1e-6)


def test_mixed_mode_requests_requeue(service):
    """Concurrent 2x and restore requests must not coalesce (different
    programs): the dispatcher requeues the other mode and serves both."""
    lr = np.random.RandomState(20).rand(16, 16).astype(np.float32)
    hr = np.random.RandomState(21).rand(32, 32).astype(np.float32)
    results = {}

    def post(key, img, mode):
        results[key] = service.submit(img, mode)

    threads = [threading.Thread(target=post, args=("a", lr, "2x")),
               threading.Thread(target=post, args=("b", hr, "restore")),
               threading.Thread(target=post, args=("c", lr, "2x"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"].shape == (32, 32)
    assert results["b"].shape == (32, 32)
    np.testing.assert_allclose(results["a"], results["c"], atol=1e-6)


def test_oversized_request_does_not_poison_coalesced_batch(service):
    """An oversized image raises to ITS OWN requester at submit time; a
    concurrent valid request that would have coalesced into the same
    dispatch window still succeeds."""
    lr = np.random.RandomState(30).rand(16, 16).astype(np.float32)
    outcome = {}

    def post_valid():
        outcome["valid"] = service.submit(lr)

    def post_oversized():
        try:
            service.submit(np.zeros((80, 80), np.float32))
            outcome["oversized"] = "no error"
        except ValueError as e:
            outcome["oversized"] = e

    threads = [threading.Thread(target=post_valid),
               threading.Thread(target=post_oversized)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcome["valid"].shape == (32, 32)
    assert isinstance(outcome["oversized"], ValueError)


def test_submit_validation_shape_class_and_messages(service):
    """submit-time validation rejects wrong-rank/channel images (they would
    poison np.stack in a coalesced batch), reports restore oversizes at the
    size the CLIENT sent, and keeps rejections on the errors counter."""
    e0 = service.stats["errors"]
    with pytest.raises(ValueError, match="expects"):
        service.submit(np.zeros((3, 16, 16), np.float32))   # nc=1 service
    with pytest.raises(ValueError, match="600x600"):
        service.submit(np.zeros((600, 600), np.float32), mode="restore")
    assert service.stats["errors"] == e0 + 2
    # the service still works after rejections
    assert service.submit(np.zeros((16, 16), np.float32)).shape == (32, 32)


def test_oversized_image_fails_cleanly(service):
    with pytest.raises(ValueError, match="exceeds max bucket"):
        service.submit(np.zeros((80, 80), np.float32))
    # the dispatcher survives the failure
    assert service.submit(np.zeros((16, 16), np.float32)).shape == (32, 32)


def test_rect_buckets_per_dimension():
    """Buckets snap per DIMENSION: a wide image lands on a rectangular
    (bh, bw) program instead of paying square padding, and the result is
    exact vs the direct rectangular pipeline."""
    cfg = get_config("gray-patch-batch-overlap", env_override=False,
                     fineSize=32, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(2))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=32, max_batch=2,
                    window_ms=5.0)
    try:
        assert len(svc.buckets) >= 2          # a real ladder, not one rung
        img = np.random.RandomState(11).rand(10, 28).astype(np.float32)
        out = svc.submit(img)
        assert out.shape == (20, 56)
        bh, bw = svc.bucket_for(10, 28)
        assert bh < bw                        # rectangular pair was chosen
        padded = np.pad(img, ((0, bh - 10), (0, bw - 28)), mode="edge")
        direct = make_overlap_sr_fn(cfg, fine=(2 * bh, 2 * bw), lr_input=True,
                                    bn_eval=True)(
            st.g_params, st.g_state, jnp.asarray(padded)[None])
        np.testing.assert_allclose(
            out, np.asarray(direct["seam"])[0, :20, :56], atol=1e-6)
    finally:
        svc.close()


def test_rect_warmup_precompiles_all_pairs():
    """warmup(rect=True) compiles every (bh, bw) ladder pair x mode, so a
    later non-square request is a program-cache hit (no new compile)."""
    cfg = get_config("gray-3", env_override=False, fineSize=16, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=12, max_batch=2,
                    window_ms=5.0)
    try:
        assert len(svc.buckets) == 2
        svc.warmup(rect=True)
        assert len(svc._fns) == len(svc.buckets) ** 2 * 2   # x two modes
        n_before = len(svc._fns)
        out = svc.submit(np.random.RandomState(12)
                         .rand(6, 10).astype(np.float32))
        assert out.shape == (12, 20) and np.isfinite(out).all()
        assert len(svc._fns) == n_before                    # cache hit
    finally:
        svc.close()


@pytest.fixture(scope="module")
def rgb_service():
    cfg = get_config("rgb-full", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=32, max_batch=4,
                    window_ms=30.0)
    yield svc
    svc.close()


def test_full_image_rgb_pm1_matches_direct(rgb_service):
    """rgb-full serves through the full-image net-2x pipeline with the pm1
    range conversion inside the service: [0,1] in, [0,1] out, and the G is
    driven on [-1,1] exactly like the eval harness (harness.py:174)."""
    from dcgan_sr_tpu.infer.tiled import make_full_sr_fn

    svc = rgb_service
    rng = np.random.RandomState(7)
    img = rng.rand(3, 26, 31).astype(np.float32)       # CHW color, ragged
    out = svc.submit(img)                              # default mode: 2x
    assert out.shape == (3, 52, 62)

    b = svc.buckets[0]
    padded = np.pad(img, ((0, 0), (0, b - 26), (0, b - 31)), mode="edge")
    direct = make_full_sr_fn(svc.cfg, lr_input=True, bn_eval=True)(
        svc.g_params, svc.g_state, jnp.asarray(padded * 2.0 - 1.0)[None])
    expected = (np.asarray(direct)[0] + 1.0) * 0.5
    np.testing.assert_allclose(out, expected[:, :52, :62], atol=1e-5)


def test_full_image_rgb_restore_mode(rgb_service):
    img = np.random.RandomState(8).rand(3, 40, 40).astype(np.float32)
    out = rgb_service.submit(img, mode="restore")
    assert out.shape == (3, 40, 40)
    assert np.isfinite(out).all()


def test_full_image_gray3_matches_direct():
    """A [0,1] full-image variant (gray-3) serves through the same pipeline
    with no range conversion."""
    from dcgan_sr_tpu.infer.tiled import make_full_sr_fn

    cfg = get_config("gray-3", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(1))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=32, max_batch=2,
                    window_ms=5.0)
    try:
        img = np.random.RandomState(9).rand(20, 20).astype(np.float32)
        out = svc.submit(img)
        assert out.shape == (40, 40)
        b = svc.buckets[0]
        padded = np.pad(img, ((0, b - 20), (0, b - 20)), mode="edge")
        direct = make_full_sr_fn(cfg, lr_input=True, bn_eval=True)(
            st.g_params, st.g_state, jnp.asarray(padded)[None, None])
        np.testing.assert_allclose(
            out, np.asarray(direct)[0, 0, :40, :40], atol=1e-6)
    finally:
        svc.close()


def test_http_round_trip_color(rgb_service):
    from PIL import Image

    srv = make_http_server(rgb_service, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        arr = (np.random.RandomState(4).rand(20, 24, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(buf, format="PNG")
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/upscale", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = Image.open(io.BytesIO(resp.read()))
        assert out.size == (48, 40) and out.mode == "RGB"
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_round_trip(service):
    from PIL import Image

    srv = make_http_server(service, port=0)            # ephemeral port
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        buf = io.BytesIO()
        arr = (np.random.RandomState(3).rand(20, 24) * 255).astype(np.uint8)
        Image.fromarray(arr).save(buf, format="PNG")

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/upscale", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = Image.open(io.BytesIO(resp.read()))
        assert out.size == (48, 40)                    # PIL size is (W, H)

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = resp.read().decode()
        assert resp.status == 200
        assert '"ready": true' in health

        # undecodable bytes: 400 JSON error AND the errors counter moves
        errs_before = service.stats["errors"]
        conn.request("POST", "/upscale", body=b"not a png at all")
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read())
        assert service.stats["errors"] == errs_before + 1
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_server_listen_backlog(service):
    # socketserver's default request_queue_size=5 drops SYNs under a
    # concurrent connect burst (each dropped client stalls a full 1 s TCP
    # retransmission timeout — measured, docs/serving.md). Pin the raised
    # backlog so a refactor can't quietly reintroduce the stall.
    srv = make_http_server(service, port=0)
    try:
        assert srv.request_queue_size >= 64
    finally:
        srv.server_close()


def test_u8_io_bit_identical_after_quantization():
    """u8_io moves the byte<->[0,1] boundary (and the pm1 map) inside the
    device program: for byte-valued inputs (what PNG uploads are), the
    quantized response must be BIT-IDENTICAL to quantizing the float path's
    output — only the transfer bytes change. Covers the tiled gray pipeline
    and the pm1 full-image (rgb-full) pipeline."""
    for variant, shape in (("gray-patch-batch-overlap", (26, 31)),
                           ("rgb-full", (3, 26, 31))):
        cfg = get_config(variant, env_override=False, **TINY)
        st = init_train_state(cfg, jax.random.PRNGKey(0))
        rng = np.random.RandomState(11)
        img = (rng.randint(0, 256, shape) / 255.0).astype(np.float32)

        f32 = SRService(cfg, st.g_params, st.g_state, max_size=32,
                        max_batch=4, window_ms=5.0)
        u8 = SRService(cfg, st.g_params, st.g_state, max_size=32,
                       max_batch=4, window_ms=5.0, u8_io=True)
        try:
            for mode in ("2x", "restore"):
                ref = f32.submit(img, mode)
                got = u8.submit(img, mode)
                ref8 = np.clip(np.round(ref * 255.0), 0, 255).astype(np.uint8)
                got8 = np.clip(np.round(got * 255.0), 0, 255).astype(np.uint8)
                assert got8.shape == ref8.shape
                np.testing.assert_array_equal(got8, ref8, err_msg=(variant, mode))
        finally:
            f32.close()
            u8.close()


def test_serve_load_driver(service):
    """tools/serve_load.py (the measurement load driver) end to end against
    a live HTTP server: every phase line is valid JSON in order, the warm
    medians are positive, and the /healthz percentiles flow through."""
    import contextlib
    from io import StringIO

    from tools import serve_load

    srv = make_http_server(service, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        buf = StringIO()
        with contextlib.redirect_stdout(buf):
            serve_load.main(["--port", str(port), "--size", "20x24",
                             "--warm", "3", "--concurrency", "2",
                             "--rounds", "1"])
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert [l["phase"] for l in lines] == [
            "cold_first", "warm_single", "concurrent", "concurrent_summary",
            "healthz"]
        assert lines[1]["n"] == 3 and lines[1]["median_ms"] > 0
        assert lines[2]["c"] == 2 and len(lines[2]["req_ms"]) == 2
        assert lines[2]["errors"] == []
        assert lines[3]["median_req_per_s"] > 0
        assert lines[3]["warm_median_req_per_s"] > 0
        assert isinstance(lines[4]["requests"], int)  # counters flowed through

        # --warm 0 / --rounds 0 skip their phases instead of crashing on
        # empty sequences (cold_first + healthz only)
        buf = StringIO()
        with contextlib.redirect_stdout(buf):
            serve_load.main(["--port", str(port), "--size", "20x24",
                             "--warm", "0", "--concurrency", "2",
                             "--rounds", "0"])
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert [l["phase"] for l in lines] == ["cold_first", "healthz"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_submit_many_chunks_to_max_batch(service):
    """A single oversized submit_many must dispatch in max_batch-sized
    chunks: one n>max_batch batch pads to the NEXT power of two — an
    unplanned program compile stalling every co-batched request."""
    rng = np.random.RandomState(41)
    imgs = [rng.rand(16, 16).astype(np.float32) for _ in range(6)]
    sizes = []
    orig = service._run_batch

    def spy(items):
        sizes.append(sum(len(it["imgs"]) for it in items))
        return orig(items)

    service._run_batch = spy
    try:
        out = service.submit_many(imgs)
    finally:
        service._run_batch = orig
    assert len(out) == 6 and all(o.shape == (32, 32) for o in out)
    assert sizes and max(sizes) <= service.max_batch


def test_coalescer_never_overshoots_max_batch(service):
    """Two concurrent multi-image requests whose sum exceeds max_batch must
    dispatch separately (requeue), not as one over-bucket batch."""
    rng = np.random.RandomState(42)
    sizes = []
    orig = service._run_batch

    def spy(items):
        sizes.append(sum(len(it["imgs"]) for it in items))
        return orig(items)

    service._run_batch = spy
    try:
        outs = [None, None]

        def post(i):
            outs[i] = service.submit_many(
                [rng.rand(16, 16).astype(np.float32) for _ in range(3)])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        service._run_batch = orig
    assert all(len(o) == 3 for o in outs)
    assert max(sizes) <= service.max_batch


def test_http_internal_dispatch_failure_is_500(service):
    """An internal dispatch failure (e.g. a wedged tunnel) must surface as
    HTTP 500, not 400 — clients/monitors treat 400 as a caller bug and
    never retry or alert."""
    from PIL import Image

    httpd = make_http_server(service, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    orig = service.submit
    service.submit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("backend wedged"))
    try:
        buf = io.BytesIO()
        Image.fromarray(np.zeros((8, 8), np.uint8), mode="L").save(
            buf, format="PNG")
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/upscale", body=buf.getvalue(),
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 500
        assert b"backend wedged" in resp.read()
    finally:
        service.submit = orig
        httpd.shutdown()


def test_warmup_default_covers_single_and_full_batch():
    """warmup()'s default batch set is (1, max_batch): both the single
    request AND the fully coalesced burst are compile-cache hits."""
    cfg = get_config("gray-3", env_override=False, fineSize=16, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(4))
    svc = SRService(cfg, st.g_params, st.g_state, max_size=12, max_batch=2,
                    window_ms=5.0)
    try:
        svc.warmup()
        # square pairs x two modes x two batch sizes, one dispatch each
        assert svc.stats["batches"] == len(svc.buckets) * 2 * 2
    finally:
        svc.close()
