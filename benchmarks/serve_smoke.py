"""TPU smoke + overhead probe of the HTTP inference service.

Boots `python -m octseg.infer.serve` as a real subprocess on the default
backend (the tunneled TPU on this rig), drives it over HTTP — healthz, a
streamed-masks pullback, a quant pullback, metrics — and records the HTTP
request wall against the server-reported device-loop seconds, i.e. what the
HTTP layer (spool + parse + NDJSON framing + base64) adds around the engine.

Small on purpose (tiny models, short pullback): the engine's full-size TPU
physics are measured elsewhere (e2e_pullback.py, bench.py); this certifies
the daemon itself on real hardware and prices its envelope.

Writes benchmarks/serve_smoke.json. Usage: python benchmarks/serve_smoke.py
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 24
INPUT = 64
BLOCK = 8


def free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def wait_healthy(port: int, proc, timeout: float = 600.0) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f'serve exited early (rc={proc.returncode})')
        try:
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/healthz', timeout=5) as r:
                return json.loads(r.read())
        except Exception:
            time.sleep(2)
    raise TimeoutError('serve never became healthy')


def main() -> None:
    import numpy as np

    from octseg.data import dicom
    from octseg.train.checkpoint import initialize_model_dir

    work = tempfile.mkdtemp(prefix='serve-smoke-')
    models = os.path.join(work, 'models')
    initialize_model_dir(os.path.join(models, 'LM'), ['Lumen'],
                         input_size=INPUT)
    initialize_model_dir(os.path.join(models, 'FC_LC'),
                         ['Lipid core', 'Fibrous cap'], input_size=INPUT)
    initialize_model_dir(os.path.join(models, 'VV'), ['Vasa vasorum'],
                         input_size=INPUT)
    rng = np.random.default_rng(0)
    dcm = os.path.join(work, 'IMG001')
    dicom.dcmwrite(dcm, rng.integers(0, 255, (N_FRAMES, INPUT, INPUT, 3),
                                     dtype=np.uint8))
    with open(dcm, 'rb') as f:
        body = f.read()

    port = free_port()
    t_boot = time.time()
    proc = subprocess.Popen(
        [sys.executable, '-m', 'octseg.infer.serve', 'host=127.0.0.1',
         f'port={port}', f'models_dir={models}', 'output_size=[64,64]',
         f'block_size={BLOCK}'],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        health = wait_healthy(port, proc)
        boot_s = time.time() - t_boot
        url = f'http://127.0.0.1:{port}/v1/pullback'

        def post(u):
            t0 = time.time()
            req = urllib.request.Request(u, data=body, method='POST')
            with urllib.request.urlopen(req, timeout=1800) as r:
                raw = r.read()
            return time.time() - t0, raw

        # first request pays the engine compiles; second is the envelope
        cold_s, _ = post(url)
        warm_s, raw = post(url)
        lines = [json.loads(ln) for ln in raw.splitlines()]
        server_s = lines[-1]['seconds']
        assert lines[0]['frames'] == N_FRAMES and lines[-1]['type'] == 'end'
        quant_s, qraw = post(url + '?format=quant')
        quant = json.loads(qraw)
        assert quant['frames'] == N_FRAMES

        out = {
            'platform': health['platform'],
            'frames': N_FRAMES,
            'input_px': INPUT,
            'block_size': BLOCK,
            'boot_to_healthy_s': round(boot_s, 1),
            'first_request_s': round(cold_s, 1),  # includes engine compiles
            'warm_masks_request_s': round(warm_s, 2),
            'server_device_loop_s': round(server_s, 2),
            'http_envelope_s': round(warm_s - server_s, 2),
            'quant_request_s': round(quant_s, 2),
        }
        path = os.path.join(REPO, 'benchmarks', 'serve_smoke.json')
        with open(path, 'w') as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        # let any in-flight device work finish before stopping the daemon
        # (killing a client mid-execution wedges the relay lease)
        time.sleep(2)
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == '__main__':
    main()
