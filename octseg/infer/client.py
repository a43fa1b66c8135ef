"""Client for the octseg inference service (octseg.infer.serve).

Sends a DICOM pullback to a running service and writes the reference
predict contract locally — per-frame ``*_overlay.png`` + ``*_mask.png``
(reference src/predict.py writes the same pair via save_results) —
rendering each NDJSON mask block as it streams in, so output appears while
the server is still computing the rest of the pullback. ``format=quant``
instead fetches the per-frame quantification rows and writes one JSON.

Runs on a workstation with no TPU stack installed: quant mode touches no
jax at all, and masks mode renders through the same ``save_results`` chain
as the local predict CLI (jax-on-CPU — byte-identical output to a local
run over the same masks).

Config: configs/client.yaml.  Usage:
    python -m octseg.infer.client server_url=http://host:7884 \
        dcm_path=data/dcm/IMG001 save_dir=out [format=quant]
"""

from __future__ import annotations

import json
import logging
import os
import urllib.request

import numpy as np

from octseg.core.config import Config, entry_point

log = logging.getLogger(__name__)


def stream_pullback(server_url: str, dcm_path: str, fmt: str = 'masks',
                    timeout: float = 3600.0):
    """POST the DICOM at ``dcm_path`` and yield parsed NDJSON records
    (``format=masks``) or yield the single quant payload (``format=quant``)."""
    with open(dcm_path, 'rb') as f:
        body = f.read()
    url = f'{server_url.rstrip("/")}/v1/pullback'
    if fmt != 'masks':
        url += f'?format={fmt}'
    req = urllib.request.Request(url, data=body, method='POST')
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if fmt == 'quant':
            yield json.loads(resp.read())
            return
        for line in resp:
            if line.strip():
                yield json.loads(line)


def save_block(frames: np.ndarray, block: dict, header: dict, classes,
               save_dir: str, base: str, width: int) -> None:
    """Render one streamed block via the shared predict render recipe —
    byte-identical to a local ``octseg.infer.predict`` run."""
    from octseg.infer.predict import render_mask_block
    from octseg.infer.serve import decode_block

    masks = decode_block(block, block['count'], header['height'],
                         header['width'])
    render_mask_block(frames, masks, block['start'],
                      (header['height'], header['width']), classes,
                      save_dir, base, width)


def run(cfg: Config) -> int:
    """Drive one pullback through the service; returns frames written."""
    fmt = cfg.get('format', 'masks')
    os.makedirs(cfg.save_dir, exist_ok=True)
    if fmt == 'quant':
        payload = next(stream_pullback(cfg.server_url, cfg.dcm_path, 'quant'))
        out = os.path.join(cfg.save_dir, 'quant.json')
        with open(out, 'w') as f:
            json.dump(payload, f, indent=1)
        log.info('Quantified %d frames -> %s', payload['frames'], out)
        return int(payload['frames'])

    # masks: render blocks as they stream; frames are re-read locally for
    # the overlay (the service never sends pixels back). Imported here so
    # quant mode stays jax-free (predict pulls in the engine).
    from octseg.infer.predict import load_pullback_frames

    frames = load_pullback_frames(cfg.dcm_path)
    base = os.path.splitext(os.path.basename(cfg.dcm_path))[0]
    width = len(str(frames.shape[0]))
    header = None
    done = 0
    complete = False
    for rec in stream_pullback(cfg.server_url, cfg.dcm_path, 'masks'):
        if rec['type'] == 'header':
            header = rec
        elif rec['type'] == 'block':
            save_block(frames, rec, header, cfg.classes, cfg.save_dir,
                       base, width)
            done += rec['count']
            log.info('rendered frames %d-%d / %d', rec['start'] + 1,
                     rec['start'] + rec['count'], header['frames'])
        elif rec['type'] == 'end':
            complete = True
            log.info('server wall: %.1f s', rec['seconds'])
    # a server that died mid-pullback just closes the stream — the missing
    # 'end' record is the client's truncation signal; fail loudly instead
    # of exiting 0 with partial PNGs
    if header is None or not complete or done != header['frames']:
        raise RuntimeError(
            f'stream truncated: rendered {done} of '
            f'{header["frames"] if header else "?"} frames (no end record)'
            if not complete else
            f'stream incomplete: rendered {done} of {header["frames"]} frames')
    return done


@entry_point('client')
def main(cfg: Config) -> None:
    run(cfg)


if __name__ == '__main__':
    main()
