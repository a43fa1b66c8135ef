"""Production inference service: a lean HTTP API over the ensemble engine.

The demo web app (octseg.analyze.app) is the reference-parity clinical UI;
this daemon is the machine-facing serving surface the reference lacks
(its inference path is an acknowledged stub, reference
src/app/tools/analysis.py:138,166 — and it ships no service at all):

    POST /v1/pullback            body = DICOM pullback bytes
         ?format=masks (default) → NDJSON stream: one header line, then one
                                   line per engine block with the bitpacked
                                   ensemble masks (base64 of np.packbits
                                   bits; client inverse is np.unpackbits —
                                   see decode_block below), then an end line.
                                   Blocks stream as the device finishes them
                                   (engine.iter_pullback), so a client draws
                                   first masks long before the pullback ends.
         ?format=quant           → single JSON document of per-frame
                                   quantification rows (area / thickness /
                                   object instance tracking — the same math
                                   as octseg.analyze.analysis.get_analysis).
    GET  /healthz                → JSON {status, platform, devices, models}.
    GET  /metrics                → Prometheus text exposition (requests,
                                   frames, seconds, busy/queued gauges).

Serving discipline (docs/SERVING.md): ONE pullback executes on the chip at
a time — the three models' executables' temp buffers cannot coexist — so
jobs serialize on a device lock with a small bounded admission queue;
beyond it the service answers 503 + Retry-After instead of queueing
unboundedly. Engine block programs come from AOT artifacts when exported
(octseg.infer.aot), so a warm model dir serves without tracing or compiling.

Config: configs/serve.yaml.  Usage: python -m octseg.infer.serve [key=value ...]
"""

from __future__ import annotations

import base64
import json
import logging
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from octseg.core.config import Config, entry_point
from octseg.core.registry import CLASS_IDS

log = logging.getLogger(__name__)

MAX_BODY_BYTES = 8 << 30  # refuse uploads beyond 8 GiB (largest ref study ≈ 1.5 GB)


def encode_block(block_masks: np.ndarray) -> Dict[str, Any]:
    """(k, H, W, 4) {0,1} float32 masks → JSON-able dict with base64 of
    np.packbits over the raveled uint8 bits."""
    bits = np.packbits(block_masks.astype(np.uint8).ravel())
    return {'data': base64.b64encode(bits.tobytes()).decode('ascii')}


def decode_block(line: Dict[str, Any], count: int, out_h: int, out_w: int,
                 n_classes: int = 4) -> np.ndarray:
    """Client-side inverse of :func:`encode_block` (used by tests and as the
    documented client recipe)."""
    raw = np.frombuffer(base64.b64decode(line['data']), np.uint8)
    total = count * out_h * out_w * n_classes
    return (np.unpackbits(raw, count=total)
            .reshape(count, out_h, out_w, n_classes).astype(np.float32))


class Metrics:
    """Thread-safe counters exposed in Prometheus text format."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests: Dict[tuple, int] = {}
        self.frames_total = 0
        self.request_seconds_sum = 0.0
        self.busy = 0
        self.admitted = 0
        self.rejected_total = 0

    def count(self, endpoint: str, status: int) -> None:
        with self._lock:
            key = (endpoint, status)
            self.requests[key] = self.requests.get(key, 0) + 1

    def render(self) -> str:
        with self._lock:
            lines = [
                '# TYPE octseg_requests_total counter',
                *(f'octseg_requests_total{{endpoint="{e}",status="{s}"}} {v}'
                  for (e, s), v in sorted(self.requests.items())),
                '# TYPE octseg_frames_total counter',
                f'octseg_frames_total {self.frames_total}',
                '# TYPE octseg_request_seconds_sum counter',
                f'octseg_request_seconds_sum {self.request_seconds_sum:.3f}',
                '# TYPE octseg_busy gauge',
                f'octseg_busy {self.busy}',
                '# TYPE octseg_queued gauge',  # admitted but not yet on the device
                f'octseg_queued {max(0, self.admitted - self.busy)}',
                '# TYPE octseg_rejected_total counter',
                f'octseg_rejected_total {self.rejected_total}',
            ]
        return '\n'.join(lines) + '\n'


class ServeState:
    """Engine + admission control shared across handler threads."""

    def __init__(self, cfg: Config):
        from octseg.infer.engine import InferenceEngine

        self.cfg = cfg
        self.classes = list(cfg.get('classes', list(CLASS_IDS)))
        self.output_size = [int(v) for v in cfg.get('output_size', [1000, 1000])]
        self.engine = InferenceEngine(
            models_dir=cfg.models_dir, classes=self.classes,
            bf16=bool(cfg.get('bf16', False)), int8=bool(cfg.get('int8', False)),
            block_size=int(cfg.get('block_size', 128)),
            output_resize=str(cfg.get('output_resize', 'prob_bilinear')),
        )
        self.metrics = Metrics()
        # one pullback on the chip at a time (three models' temp buffers
        # cannot coexist); small bounded queue, then 503
        self._device_lock = threading.Lock()
        self._admission = threading.BoundedSemaphore(
            1 + int(cfg.get('max_queued', 1)))
        self.spool_dir = cfg.get('spool_dir') or tempfile.mkdtemp(
            prefix='octseg-serve-')

    def admit(self) -> bool:
        ok = self._admission.acquire(blocking=False)
        if ok:
            with self.metrics._lock:
                self.metrics.admitted += 1
        else:
            with self.metrics._lock:
                self.metrics.rejected_total += 1
        return ok

    def release(self) -> None:
        with self.metrics._lock:
            self.metrics.admitted -= 1
        self._admission.release()

    def device(self):
        return self._device_lock

    def health(self) -> Dict[str, Any]:
        import jax

        return {
            'status': 'ok',
            'platform': jax.devices()[0].platform,
            'devices': len(jax.devices()),
            'models': sorted({m['model_dir'] for c, m in
                              _models_meta().items() if c in self.classes}),
            'classes': self.classes,
            'output_size': self.output_size,
        }


def _models_meta():
    from octseg.infer.engine import MODELS_META

    return MODELS_META


def quantify_pullback(state: ServeState, frames: np.ndarray) -> Dict[str, Any]:
    """Run the ensemble and reduce each frame to quantification rows —
    the analyzer math (octseg.analyze.analysis, reference
    src/app/tools/analysis.py:190-213) without a work dir or image payloads."""
    from octseg.analyze.analysis import quantify_frame

    # masks are quantified at output_size resolution, so the px→unit ratio
    # must come from the SAME resolution (get_analysis's ratio source and
    # mask resolution always coincide; reference analysis.py:155)
    ratio = max(1, int(state.output_size[0] * 150 // 1000))
    objects: Dict[str, Dict[str, list]] = {
        c: {'slice': [], 'object_id': [], 'area': [], 'thickness_mean': [],
            'thickness_min': []} for c in state.classes}
    for start, block_masks in state.engine.iter_pullback(
            frames, state.output_size):
        blk = block_masks.astype(np.uint8)
        for j in range(blk.shape[0]):
            idx = start + j
            for class_name in state.classes:
                ch = CLASS_IDS[class_name] - 1
                channel = blk[j, :, :, ch] * 255
                # analyzer parity: a frame counts only when the channel is
                # binary with BOTH values present — an all-set mask is
                # skipped too (get_analysis's np.unique(...)!=2 check,
                # reference analysis.py:186)
                if not channel.any() or channel.all():
                    continue
                obj = objects[class_name]
                # instance tracking by slice continuity
                if not obj['object_id']:
                    obj['object_id'].append(0)
                elif idx == obj['slice'][-1] + 1:
                    obj['object_id'].append(obj['object_id'][-1])
                else:
                    obj['object_id'].append(obj['object_id'][-1] + 1)
                obj['slice'].append(idx)
                q = quantify_frame(channel, ratio)
                obj['area'].append(q['area'])
                obj['thickness_mean'].append(q['thickness_mean'])
                obj['thickness_min'].append(q['thickness_min'])
    return {'frames': int(frames.shape[0]), 'ratio': ratio,
            'output_size': state.output_size, 'objects': objects}


def make_handler(state: ServeState):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.0: responses are delimited by connection close, which lets
        # the masks endpoint stream NDJSON lines without chunked framing
        protocol_version = 'HTTP/1.0'

        def log_message(self, fmt, *args):
            log.info('%s - %s', self.address_string(), fmt % args)

        def _send(self, code: int, body: bytes, ctype: str,
                  headers: Optional[Dict[str, str]] = None) -> None:
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: Dict[str, Any],
                       headers: Optional[Dict[str, str]] = None) -> None:
            self._send(code, json.dumps(obj).encode(), 'application/json',
                       headers)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == '/healthz':
                self._send_json(200, state.health())
                state.metrics.count('healthz', 200)
            elif path == '/metrics':
                self._send(200, state.metrics.render().encode(),
                           'text/plain; version=0.0.4')
            else:
                self._send_json(404, {'error': f'no route {path}'})
                state.metrics.count('other', 404)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != '/v1/pullback':
                self._send_json(404, {'error': f'no route {parsed.path}'})
                state.metrics.count('other', 404)
                return
            fmt = parse_qs(parsed.query).get('format', ['masks'])[0]
            if fmt not in ('masks', 'quant'):
                self._send_json(400, {'error': f'unknown format {fmt!r}'})
                state.metrics.count('pullback', 400)
                return
            length = int(self.headers.get('Content-Length') or 0)
            if length <= 0:
                self._send_json(411, {'error': 'Content-Length required'})
                state.metrics.count('pullback', 411)
                return
            if length > MAX_BODY_BYTES:
                self._send_json(413, {'error': f'body exceeds {MAX_BODY_BYTES}'})
                state.metrics.count('pullback', 413)
                return
            if not state.admit():
                self._send_json(503, {'error': 'busy'},
                                headers={'Retry-After': '10'})
                state.metrics.count('pullback', 503)
                return
            t0 = time.time()
            self._streaming_started = False
            try:
                self._handle_pullback(length, fmt)
            except BrokenPipeError:
                log.warning('client dropped mid-stream')
                state.metrics.count('pullback', 499)  # client closed
            except Exception as e:  # surface as a 500, never kill the server
                log.exception('pullback request failed')
                if not self._streaming_started:
                    try:
                        self._send_json(500, {'error': str(e)})
                    except Exception:
                        pass
                # else: the 200 + NDJSON headers are already on the wire —
                # writing a second status line would corrupt the stream, so
                # just close; the client detects the missing 'end' record
                state.metrics.count('pullback', 500)
            finally:
                state.release()
                with state.metrics._lock:
                    state.metrics.request_seconds_sum += time.time() - t0

        def _handle_pullback(self, length: int, fmt: str) -> None:
            from octseg.infer.predict import load_pullback_frames

            # spool the upload: the DICOM parser mmaps a path, and a file
            # keeps the request body out of resident memory
            fd, spool = tempfile.mkstemp(dir=state.spool_dir, suffix='.dcm')
            try:
                with os.fdopen(fd, 'wb') as f:
                    remaining = length
                    while remaining:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            raise IOError('truncated request body')
                        f.write(chunk)
                        remaining -= len(chunk)
                frames = load_pullback_frames(spool)
            finally:
                try:
                    os.unlink(spool)
                except OSError:
                    pass

            with state.device():
                with state.metrics._lock:
                    state.metrics.busy = 1
                try:
                    if fmt == 'quant':
                        payload = quantify_pullback(state, frames)
                        self._send_json(200, payload)
                    else:
                        self._stream_masks(frames)
                finally:
                    with state.metrics._lock:
                        state.metrics.busy = 0
                        state.metrics.frames_total += int(frames.shape[0])
            state.metrics.count('pullback', 200)

        def _stream_masks(self, frames: np.ndarray) -> None:
            out_h, out_w = state.output_size
            self.send_response(200)
            self.send_header('Content-Type', 'application/x-ndjson')
            self.end_headers()
            self._streaming_started = True

            def line(obj: Dict[str, Any]) -> None:
                self.wfile.write(json.dumps(obj).encode() + b'\n')
                self.wfile.flush()

            line({'type': 'header', 'frames': int(frames.shape[0]),
                  'height': out_h, 'width': out_w,
                  'classes': state.classes, 'encoding': 'packbits',
                  'channel_order': list(CLASS_IDS)})
            t0 = time.time()
            for start, block_masks in state.engine.iter_pullback(
                    frames, state.output_size):
                rec = {'type': 'block', 'start': int(start),
                       'count': int(block_masks.shape[0])}
                rec.update(encode_block(block_masks))
                line(rec)
            line({'type': 'end', 'frames': int(frames.shape[0]),
                  'seconds': round(time.time() - t0, 3)})

    return Handler


def serve(cfg: Config, block: bool = True) -> ThreadingHTTPServer:
    state = ServeState(cfg)
    httpd = ThreadingHTTPServer(
        (cfg.get('host', '0.0.0.0'), int(cfg.get('port', 7884))),
        make_handler(state))
    httpd.octseg_state = state  # tests reach the state through the server
    log.info('octseg serving on %s:%d (models=%s classes=%s)',
             *httpd.server_address, cfg.models_dir, state.classes)
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


@entry_point('serve')
def main(cfg: Config) -> None:
    serve(cfg, block=True)


if __name__ == '__main__':
    main()
