#!/usr/bin/env python3
"""Persistent batched SR serving — compile once, serve many.

`tools/upscale.py` pays XLA compilation (1-3.5 min through the TPU tunnel)
on EVERY invocation; a deployment instead holds ONE live jax client
(CLAUDE.md tunnel discipline) with the overlap-SR program compiled per
shape bucket, and serves HTTP requests with micro-batching: concurrent
requests within a short window coalesce into one device dispatch, riding
the pipeline's measured batch efficiency (docs/attr_variants.md — the
generator is bandwidth-bound, so batching is nearly free throughput).

Every variant serves: patch configs (gray-patch*, …-overlap) run the
overlap-tile pipeline; full-image configs (rgb-full/gray/gray-2/gray-3)
feed the whole image to their fully-convolutional net-2x generator
(infer/tiled.py make_full_sr_fn). pm1 variants' [-1,1] range conversion
happens inside the service — HTTP is [0,1] image bytes end to end.
The compute path is the round-4 recommended quality stack by default:
true-2x `lr_input` (bit-identical to the trained regime) + running-stats
BN (`bn_eval`, +5.6 dB over parity BN, PARITY.md) + the flat (N*T)-tile
dispatch for patch configs (measured +15%). Reference lineage:
train-gray-patch-batch-overlap.lua:377-704 (the tiled pipeline),
train.lua:97-113 (the rgb net-2x generator).

  python tools/serve.py --config gray-patch-batch-overlap \
      --ckpt checkpoints/..._net_G.npz --port 8000 --warmup
  curl --data-binary @face.png http://localhost:8000/upscale > face_sr.png

Endpoints:
  POST /upscale      image bytes (PNG/JPEG) -> PNG. Default: true-2x
                     (HxW low-res in, 2Hx2W out). `?mode=restore` runs the
                     reference eval protocol instead (degrade internally,
                     same-size output).
  GET  /healthz      JSON: ready, compiled buckets, request/batch counters.

Static shapes are an XLA requirement, not an implementation detail: each
input dimension is edge-padded to a small ladder of pipeline-legal bucket
extents (PER dimension — non-square inputs don't pay square padding) and
batches to power-of-two sizes; --warmup precompiles the square pairs at
batch 1 AND max_batch (rectangular pairs and intermediate power-of-two
batches compile lazily on first hit; --warmup-rect precompiles the rect
pairs too), so the steady-state program count stays small and every repeat
shape is a cache hit.
"""

import argparse
import io
import json
import os
import queue
import sys
import threading
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SRService:
    """Owns the jax client: per-bucket jitted pipelines + a dispatcher
    thread that coalesces queued requests into batched device dispatches.

    `submit(img_hw, mode)` is thread-safe and blocks until the result is
    ready; all jax calls happen on the single dispatcher thread."""

    def __init__(self, cfg, g_params, g_state, *, max_size=256, max_batch=8,
                 window_ms=5.0, bn_eval=True, self_ensemble=1,
                 compute_dtype=None, u8_io=False):
        from dcgan_sr_tpu.infer.tiled import lr_pad_dim

        self.cfg = cfg
        self.g_params, self.g_state = g_params, g_state
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1e3
        self.bn_eval = bool(bn_eval)
        self.self_ensemble = int(self_ensemble)
        self.compute_dtype = compute_dtype
        # uint8 device I/O: the [0,1]<->byte conversion (and the pm1 range
        # map) moves INSIDE the jitted program, so host<->device transfers
        # carry 1 byte/px instead of 4. Bit-identical for HTTP clients: the
        # input PNG is bytes already (k/255. == u8/255. on device) and the
        # response path quantizes with the same clip(round(x*255)) the
        # handler would apply — the tunnel bytes are the only thing changed.
        self.u8_io = bool(u8_io)
        # patch variants serve through the overlap-tile pipeline (their G maps
        # 4x4 tiles); full-image variants (rgb-full/gray/gray-2/gray-3) feed
        # the whole image to their fully-convolutional net-2x G
        self.tiled = cfg.patch_based
        # pm1 variants train on [-1,1] (donkey_folder.lua:69): the service
        # owns the range conversion so HTTP stays [0,1] bytes end to end
        self.pm1 = cfg.data_range == "pm1"
        if self.tiled:
            p, ov = cfg.patchSize, cfg.overlap
            snap = lambda d: lr_pad_dim(d, p, ov)  # noqa: E731
        else:
            snap = lambda d: d + (d % 2)           # noqa: E731  even extents
        # LR-extent ladder: ~1.5x steps snapped to pipeline-legal extents,
        # from the training grid (fineSize/2) up to max_size
        buckets, d = [], cfg.fineSize // 2
        while d < max_size:
            b = snap(d)
            if not buckets or b > buckets[-1]:
                buckets.append(b)
            d = int(d * 1.5)
        self.buckets = buckets + [snap(max_size)]
        self._fns = {}            # (bh, bw, mode) -> jitted pipeline
        self._q = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "errors": 0}
        self._stats_lock = threading.Lock()  # handler threads + dispatcher
        self._lat_ms = []         # last N batch dispatch latencies (host wall)
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()

    # -- shape discipline ---------------------------------------------------

    def bucket_for(self, h, w):
        """Smallest ladder pair (bh, bw) covering (h, w) — per DIMENSION,
        so non-square inputs don't pay square padding (both pipelines take
        rectangular extents; a 3:2 photo on a square bucket would waste
        ~1.5x compute, a 4:1 panorama ~4x)."""
        def snap1(d):
            for b in self.buckets:
                if b >= d:
                    return b
            raise ValueError(f"image {h}x{w} exceeds max bucket "
                             f"{self.buckets[-1]} (raise --max-size)")
        return snap1(h), snap1(w)

    @staticmethod
    def _lr_extent(h, w, mode):
        """LR extents a (h, w) request occupies — the ONE rule shared by
        submit-time validation and the dispatcher's bucketing (restore
        inputs arrive at OUTPUT, i.e. 2x, scale)."""
        return (h, w) if mode == "2x" else ((h + 1) // 2, (w + 1) // 2)

    def _validate(self, img, mode):
        """Reject malformed requests in the CALLER's thread, before they can
        reach the queue and poison a coalesced batch (np.stack or bucket_for
        failing inside the dispatcher fails every co-batched request)."""
        nc = self.cfg.nc
        ok = img.ndim == 2 if nc == 1 else (img.ndim == 3
                                            and img.shape[0] == nc)
        if not ok:
            raise ValueError(
                f"config {self.cfg.variant} expects "
                f"{'(H, W)' if nc == 1 else f'({nc}, H, W)'} images, "
                f"got shape {tuple(img.shape)}")
        h, w = img.shape[-2:]
        try:
            self.bucket_for(*self._lr_extent(h, w, mode))
        except ValueError:
            # report the size the CLIENT sent (restore halves it internally)
            raise ValueError(
                f"image {h}x{w} (LR {'x'.join(map(str, self._lr_extent(h, w, mode)))}) "
                f"exceeds max bucket {self.buckets[-1]} (raise --max-size)"
            ) from None

    def _fn(self, bh, bw, mode):
        """(bh, bw, mode) -> pipeline(params, state, batch) -> SR batch.

        Tiled: (N, H, W) in / (N, ·, ·) seam-stitched out.  Full-image:
        (N, nc, H, W) in / out.  Range is the generator's own (see _run_batch).
        """
        key = (bh, bw, mode)
        if key not in self._fns:
            lr_input = mode != "restore"        # restore = eval protocol
            if self.tiled:
                from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
                fn = make_overlap_sr_fn(
                    self.cfg, fine=(2 * bh, 2 * bw),
                    lr_input=lr_input, bn_eval=self.bn_eval,
                    self_ensemble=self.self_ensemble,
                    compute_dtype=self.compute_dtype)
                self._fns[key] = lambda p, s, x, _fn=fn: _fn(p, s, x)["seam"]
            else:
                from dcgan_sr_tpu.infer.tiled import make_full_sr_fn
                self._fns[key] = make_full_sr_fn(
                    self.cfg, lr_input=lr_input, bn_eval=self.bn_eval,
                    self_ensemble=self.self_ensemble,
                    compute_dtype=self.compute_dtype)
            if self.u8_io:
                self._fns[key] = self._u8_wrap(self._fns[key])
        return self._fns[key]

    def _u8_wrap(self, f):
        """uint8-boundary program: bytes in -> [0,1] (-> pm1) -> pipeline ->
        clip(round(x*255)) -> bytes out, all inside the jit (see __init__)."""
        import jax
        import jax.numpy as jnp

        def g(params, state, x8):
            x = x8.astype(jnp.float32) / 255.0
            if self.pm1:
                x = x * 2.0 - 1.0
            y = f(params, state, x)
            if self.pm1:
                y = (y + 1.0) * 0.5
            return jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.uint8)

        return jax.jit(g)

    def warmup(self, batch_sizes=None, rect=False):
        """Precompile the SQUARE (bucket, mode, batch) programs so typical
        requests never wait on the tunnel compile; with rect=True, ALL
        (bh, bw) ladder pairs (O(buckets^2) programs — each is a 1-3 min
        tunnel compile cold, so opt-in) so the first non-square request is
        a cache hit too.  batch_sizes defaults to (1, max_batch): singles
        AND full coalesced bursts are cache hits (intermediate power-of-two
        batches still compile lazily on first hit).  Runs ON the dispatcher
        queue so the single-client discipline holds."""
        if batch_sizes is None:
            batch_sizes = (1,) if self.max_batch == 1 else (1, self.max_batch)
        shape = (self.cfg.nc,) if self.cfg.nc != 1 else ()
        pairs = ([(bh, bw) for bh in self.buckets for bw in self.buckets]
                 if rect else [(b, b) for b in self.buckets])
        for bh, bw in pairs:
            for mode in ("2x", "restore"):
                for n in batch_sizes:
                    sh, sw = (bh, bw) if mode == "2x" else (2 * bh, 2 * bw)
                    img = np.zeros(shape + (sh, sw), np.float32)
                    self.submit_many([img] * n, mode)

    def _count(self, key, n=1):
        """Thread-safe stats increment: bare `+= 1` from concurrent HTTP
        handler threads loses counts (load/add/store across bytecodes)."""
        with self._stats_lock:
            self.stats[key] += n

    # -- request path ---------------------------------------------------------

    def submit(self, img_hw, mode="2x"):
        """SR one (H, W) [0,1] image; blocks until the batched dispatch that
        includes it completes.  Returns the cropped output array."""
        return self.submit_many([img_hw], mode)[0]

    def submit_many(self, imgs, mode="2x"):
        try:
            for im in imgs:
                self._validate(im, mode)
        except ValueError:
            self._count("errors")        # rejected requests stay visible
            raise                        # on the /healthz errors counter
        if len(imgs) > self.max_batch:
            # an oversized request must not defeat the power-of-two batch
            # bucketing (a batch > max_batch pads to the NEXT power of two —
            # an unplanned 1-3 min tunnel compile stalling every co-batched
            # request): dispatch it in max_batch-sized chunks
            out = []
            for i in range(0, len(imgs), self.max_batch):
                out.extend(self.submit_many(imgs[i:i + self.max_batch], mode))
            return out
        done = threading.Event()
        item = {"imgs": imgs, "mode": mode, "done": done}
        self._q.put(item)
        done.wait()
        if "error" in item:
            raise item["error"]
        return item["results"]

    # -- dispatcher (the only thread that touches jax) ------------------------

    def _dispatch_loop(self):
        while True:
            items = [self._q.get()]
            if items[0] is None:
                return
            # micro-batch: coalesce whatever lands within the window, up to
            # max_batch images, same mode only (different programs)
            deadline = time.monotonic() + self.window_s
            requeue = []
            saw_none = False
            count = len(items[0]["imgs"])
            while count < self.max_batch:
                tmo = deadline - time.monotonic()
                if tmo <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=tmo)
                except queue.Empty:
                    break
                if nxt is None:
                    saw_none = True     # re-put AFTER the requeued items
                    break
                if (nxt["mode"] == items[0]["mode"]
                        and count + len(nxt["imgs"]) <= self.max_batch):
                    items.append(nxt)
                    count += len(nxt["imgs"])
                else:
                    # different program (mode) or would overflow the batch
                    # bucket: next dispatch picks it up
                    requeue.append(nxt)
            # requeue BEFORE any shutdown sentinel: items put behind the
            # re-put None would be abandoned and their submitters would
            # block forever on done.wait()
            for r in requeue:
                self._q.put(r)
            if saw_none:
                self._q.put(None)
            try:
                self._run_batch(items)
            except Exception as e:  # fail the requests, not the server
                self._count("errors", len(items))
                for it in items:
                    it["error"] = e
                    it["done"].set()

    def _run_batch(self, items):
        import jax.numpy as jnp

        mode = items[0]["mode"]
        flat = [(it, im) for it in items for im in it["imgs"]]
        sizes = [im.shape[-2:] for _, im in flat]
        mh, mw = (max(h for h, _ in sizes), max(w for _, w in sizes))
        bh, bw = self.bucket_for(*self._lr_extent(mh, mw, mode))
        side_h, side_w = (bh, bw) if mode == "2x" else (2 * bh, 2 * bw)
        batch = np.stack([
            np.pad(im, [(0, 0)] * (im.ndim - 2)
                   + [(0, side_h - im.shape[-2]), (0, side_w - im.shape[-1])],
                   mode="edge") for _, im in flat])
        n = len(batch)
        # power-of-two batch bucket bounds the program count; per-image
        # results are independent of batch padding in BOTH BN modes (bn_eval
        # uses running stats; parity train-mode BN is per-image — vmapped
        # tiles for patch configs, batch-1 vmap in make_full_sr_fn)
        n2 = 1 << (n - 1).bit_length()
        if n2 > n:
            batch = np.concatenate([batch, batch[:1].repeat(n2 - n, axis=0)])
        if not self.tiled and batch.ndim == 3:   # full pipeline wants NCHW
            batch = batch[:, None]
        if self.u8_io:              # byte transfers; range maps live on device
            batch = np.clip(np.round(batch * 255.0), 0, 255).astype(np.uint8)
        elif self.pm1:              # HTTP is [0,1]; the G trains on [-1,1]
            batch = batch * 2.0 - 1.0
        t0 = time.monotonic()
        out = self._fn(bh, bw, mode)(self.g_params, self.g_state,
                                     jnp.asarray(batch))
        sr = np.asarray(out)[:n]          # host fetch closes the dispatch
        self._lat_ms.append((time.monotonic() - t0) * 1e3)
        del self._lat_ms[:-256]           # ring of recent batch latencies
        if self.u8_io:
            sr = sr.astype(np.float32) / 255.0
        elif self.pm1:
            sr = (sr + 1.0) * 0.5
        if not self.tiled and self.cfg.nc == 1:
            sr = sr[:, 0]
        self._count("requests", n)
        self._count("batches")
        k = 0
        for it in items:
            res = []
            for im in it["imgs"]:
                h, w = im.shape[-2:]
                oh, ow = (2 * h, 2 * w) if mode == "2x" else (h, w)
                res.append(sr[k][..., :oh, :ow])
                k += 1
            it["results"] = res
            it["done"].set()

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)


def make_http_server(service, port=8000, host="127.0.0.1"):
    """ThreadingHTTPServer over an SRService: handler threads only
    decode/encode and enqueue; the service's dispatcher owns the device."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from dcgan_sr_tpu.image.io import load_image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # stdout stays for the service's own logs
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                return self._json(404, {"error": "unknown path"})
            lat = sorted(service._lat_ms)
            pct = (lambda q: round(lat[int(q * (len(lat) - 1))], 1)) \
                if lat else (lambda q: None)
            self._json(200, {
                "ready": True,
                "config": service.cfg.variant,
                "buckets_lr": service.buckets,
                "compiled": sorted(f"{bh}x{bw}:{m}"
                                   for bh, bw, m in service._fns),
                **service.stats,
                # batch-dispatch wall latency over the recent ring (ms);
                # the first entries after a cold start include XLA compiles
                "batch_ms_p50": pct(0.5), "batch_ms_p95": pct(0.95),
            })

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/upscale":
                return self._json(404, {"error": "unknown path"})
            mode = "restore" if "mode=restore" in query else "2x"
            try:
                length = int(self.headers.get("Content-Length", 0))
                nc = service.cfg.nc
                img = load_image(io.BytesIO(self.rfile.read(length)), nc=nc)
            except Exception as e:      # undecodable bytes: count + reject
                service._count("errors")
                return self._json(400, {"error": str(e)})
            try:                        # submit counts its own rejections
                sr = service.submit(img[0] if nc == 1 else img, mode)
            except ValueError as e:     # rejected input (size/channels)
                return self._json(400, {"error": str(e)})
            except Exception as e:      # internal dispatch failure (e.g. a
                return self._json(500, {"error": str(e)})  # wedged tunnel)
            from PIL import Image
            out8 = (np.clip(np.round(np.asarray(sr) * 255.0), 0, 255)
                    .astype(np.uint8))
            if out8.ndim == 3:                    # CHW -> HWC color PNG
                out8 = np.moveaxis(out8, 0, -1)
            buf = io.BytesIO()
            Image.fromarray(out8).save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5: a C-way simultaneous
        # connect burst (C > 5) overflows the accept queue, the kernel drops
        # the SYN, and that client stalls a full 1 s TCP retransmission
        # timeout — measured as lone ~1.08 s stragglers in otherwise ~100 ms
        # 8-way rounds (docs/serving.md, healthy-tunnel re-measurement).
        request_queue_size = 128

    return Server((host, port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="gray-patch-batch-overlap")
    ap.add_argument("--ckpt", help="framework checkpoint (…_net_G.npz)")
    ap.add_argument("--t7", help="reference Torch checkpoint (net_G.t7)")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-size", type=int, default=256,
                    help="largest LR input extent served")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=5.0,
                    help="micro-batch aggregation window")
    ap.add_argument("--parity-bn", action="store_true",
                    help="per-image train-mode BN (the reference's math) "
                         "instead of the default running-stats quality mode")
    ap.add_argument("--self-ensemble", type=int, default=1,
                    choices=(1, 2, 4, 8))
    ap.add_argument("--warmup", action="store_true",
                    help="precompile every square (bucket, mode) program at "
                         "startup")
    ap.add_argument("--warmup-rect", action="store_true",
                    help="also precompile every RECTANGULAR (bh, bw) ladder "
                         "pair (O(buckets^2) programs, each a 1-3 min tunnel "
                         "compile cold) so non-square first requests never "
                         "stall")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (the benched training/inference "
                         "precision; quality delta validated at 0.37 dB "
                         "over 100 training steps — README)")
    ap.add_argument("--u8-io", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="uint8 device I/O (default ON): byte<->[0,1] (and "
                         "pm1) range maps run inside the jitted program so "
                         "host<->device transfers carry 1 byte/px instead "
                         "of 4 — bit-identical PNG responses (the "
                         "quantization moves from the HTTP handler onto the "
                         "device; measured -7%% warm latency, +25%% 8-way "
                         "throughput on hardware, docs/serving.md). "
                         "--no-u8-io keeps float32 transfers (unquantized "
                         "submit() results for in-process callers)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.models import generator_spec
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config(args.config)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    g_params, g_state = state.g_params, state.g_state
    if args.t7:
        from dcgan_sr_tpu.compat import import_torch_generator
        g_params, g_state = import_torch_generator(
            args.t7, generator_spec(cfg), g_params, g_state)
    elif args.ckpt:
        from dcgan_sr_tpu.train.checkpoint import load_branch, npz_branches
        data = np.load(args.ckpt)
        g_params = load_branch(data, "ema" if args.ema else "params",
                               g_params)
        if "state" in npz_branches(data):
            g_state = load_branch(data, "state", g_state)
        elif not args.parity_bn:
            sys.exit("running-stats serving needs a checkpoint with a "
                     "'state' branch (or pass --parity-bn)")
    else:
        print("WARNING: no checkpoint given; serving a random-init G")

    import jax.numpy as jnp
    service = SRService(cfg, g_params, g_state, max_size=args.max_size,
                        max_batch=args.max_batch, window_ms=args.window_ms,
                        bn_eval=not args.parity_bn,
                        self_ensemble=args.self_ensemble,
                        compute_dtype=jnp.bfloat16 if args.bf16 else None,
                        u8_io=args.u8_io)
    if args.warmup or args.warmup_rect:
        t0 = time.perf_counter()
        service.warmup(rect=args.warmup_rect)
        print(f"warmup: {len(service._fns)} programs compiled in "
              f"{time.perf_counter() - t0:.1f}s")
    srv = make_http_server(service, args.port, args.host)
    print(f"serving {cfg.variant} on http://{args.host}:{args.port}  "
          f"(LR buckets {service.buckets}, max_batch {args.max_batch})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
        service.close()


if __name__ == "__main__":
    main()
