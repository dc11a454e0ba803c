"""Minimal HTTP serving front-end over the continuous-batching engine.

Stdlib-only (the environment installs nothing): a ThreadingHTTPServer
accepting JSON POSTs, a single ENGINE THREAD owning the device (JAX
dispatch is not thread-safe across concurrent callers — every request
thread only enqueues and waits), and the PagedEngine doing the actual
continuous batching underneath. The reference has no serving layer at
all (demo/main.cpp handles exactly one prompt per process); this is the
piece a production deployment puts in front of the engine.

Endpoints:
  POST /generate   {"prompt": str | "prompt_ids": [int],
                    "max_new_tokens": int=128}
      -> {"text": str?, "ids": [int], "ttft_ms": float, "tokens": int}
  GET  /healthz    -> {"ok": true, "active": n, "queued": n}
  GET  /metrics    -> served-request counters + TTFT/latency percentiles
                      over the last 512 completions (JSON; the serving
                      counterpart of bench.py's one-line contract)

Usage:
  python -m kuiperllama_tpu.serving.server --model m.q8.bin \
      --tokenizer tok.model --family llama2 --port 8000
or in-process (tests):
  srv = InferenceServer(engine, tokenizer); srv.start(); srv.submit(...)
"""

from __future__ import annotations

import collections
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .engine import Engine, Request


class InferenceServer:
    """Engine-thread wrapper: HTTP (or any) threads submit requests and
    block on a per-request event; one loop thread owns the engine/device."""

    def __init__(self, engine: Engine, tokenizer=None,
                 poll_idle_s: float = 0.005):
        self.engine = engine
        self.tokenizer = tokenizer if tokenizer is not None \
            else engine.tokenizer
        self._q: "queue.Queue[tuple[Request, threading.Event]]" = \
            queue.Queue()
        self._events = {}
        self._lock = threading.Lock()
        self._poll = poll_idle_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # serving metrics: lifetime counters + a sliding window of the
        # last 512 completions for percentile stats
        self.n_served = 0
        self.n_tokens = 0
        self.started_unix = time.time()
        self._window = collections.deque(maxlen=512)

    # -- engine thread

    def _loop(self):
        eng = self.engine
        while not self._stop.is_set():
            moved = False
            while True:
                try:
                    req, ev = self._q.get_nowait()
                except queue.Empty:
                    break
                with self._lock:
                    self._events[req.request_id] = ev
                eng.submit(req)
                moved = True
            if eng.has_work:
                for fin in eng.step():
                    with self._lock:
                        ev = self._events.pop(fin.request_id, None)
                        self.n_served += 1
                        self.n_tokens += len(fin.out_ids)
                        self._window.append(
                            (fin.ttft_s,
                             fin.finish_time - fin.submit_time,
                             len(fin.out_ids)))
                    if ev is not None:
                        ev.set()
                moved = True
            if not moved:
                time.sleep(self._poll)

    def start(self):
        assert self._thread is None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    # -- request surface (thread-safe)

    def submit(self, prompt: Optional[str] = None, prompt_ids=None,
               max_new_tokens: int = 128, timeout_s: float = 600.0) -> dict:
        if prompt_ids is None:
            assert prompt is not None, "prompt or prompt_ids required"
            assert self.tokenizer is not None, "no tokenizer configured"
            prompt_ids = self.tokenizer.encode(prompt)
        req = Request(prompt_ids=list(int(i) for i in prompt_ids),
                      max_new_tokens=int(max_new_tokens))
        req.submit_time = time.perf_counter()  # TTFT includes queue wait
        ev = threading.Event()
        self._q.put((req, ev))
        if not ev.wait(timeout_s):
            raise TimeoutError(f"request {req.request_id} timed out")
        out = dict(ids=list(req.out_ids),
                   tokens=len(req.out_ids),
                   ttft_ms=round(req.ttft_s * 1e3, 1),
                   wall_ms=round((req.finish_time - req.submit_time) * 1e3,
                                 1))
        if self.tokenizer is not None:
            out["text"] = self.tokenizer.decode(req.out_ids)
        return out

    def metrics(self) -> dict:
        eng = self.engine
        with self._lock:
            win = list(self._window)
        out = dict(
            uptime_s=round(time.time() - self.started_unix, 1),
            served=self.n_served, tokens=self.n_tokens,
            active=eng.n_active, queued=len(eng.queue),
            preemptions=getattr(eng, "n_preemptions", 0),
        )
        if win:
            def pct(vals, p):
                v = sorted(vals)
                return round(v[min(len(v) - 1, int(len(v) * p / 100))], 4)

            ttfts = [w[0] for w in win]
            walls = [w[1] for w in win]
            toks = sum(w[2] for w in win)
            out.update(
                window=len(win),
                ttft_s_p50=pct(ttfts, 50), ttft_s_p99=pct(ttfts, 99),
                latency_s_p50=pct(walls, 50), latency_s_p99=pct(walls, 99),
                window_tokens=toks,
            )
        return out


def make_http_server(inference: InferenceServer, host: str = "127.0.0.1",
                     port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                eng = inference.engine
                self._json(200, {"ok": True, "active": eng.n_active,
                                 "queued": len(eng.queue)})
            elif self.path == "/metrics":
                self._json(200, inference.metrics())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                out = inference.submit(
                    prompt=payload.get("prompt"),
                    prompt_ids=payload.get("prompt_ids"),
                    max_new_tokens=payload.get("max_new_tokens", 128),
                )
                self._json(200, out)
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import argparse

    import jax.numpy as jnp

    from ..api import KuiperModel
    from .engine import PagedEngine

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--tokenizer")
    ap.add_argument("--family", default="llama2")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--prefill-chunk", type=int, default=256)
    args = ap.parse_args()

    model = KuiperModel.from_checkpoint(args.model, args.tokenizer,
                                        family=args.family)
    model.init(dtype=jnp.bfloat16)
    eng = PagedEngine(model.cfg, model.params, tokenizer=model.tokenizer,
                      max_batch=args.slots, max_len=args.max_len,
                      cache_dtype=jnp.bfloat16,
                      prefill_chunk=args.prefill_chunk)
    srv = InferenceServer(eng)
    srv.start()
    httpd = make_http_server(srv, args.host, args.port)
    print(f"[server] listening on {args.host}:{args.port} "
          f"({args.slots} slots, max_len {args.max_len})")
    try:
        httpd.serve_forever()
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
