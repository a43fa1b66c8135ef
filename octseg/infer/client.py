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
    resp = urllib.request.urlopen(req, timeout=timeout)
    if fmt == 'quant':
        yield json.loads(resp.read())
        return
    for line in resp:
        if line.strip():
            yield json.loads(line)


def save_block(frames: np.ndarray, block: dict, header: dict, classes,
               save_dir: str, base: str, width: int) -> None:
    """Render one streamed block to the predict-contract PNG pair per frame."""
    from PIL import Image

    from octseg.data.utils import save_results
    from octseg.infer.serve import decode_block

    start, count = block['start'], block['count']
    masks = decode_block(block, count, header['height'], header['width'])
    images, names = [], []
    for j in range(count):
        arr = frames[start + j]
        arr = arr[..., 0] if (arr.ndim == 3 and arr.shape[-1] == 1) else arr
        images.append(Image.fromarray(arr).convert('RGB')
                      .resize((header['width'], header['height'])))
        names.append(f'{base}_{start + j + 1:0{width}d}')
    save_results(images=images, masks=list(masks), images_name=names,
                 classes=list(classes), save_dir=save_dir)


def run(cfg: Config) -> int:
    """Drive one pullback through the service; returns frames written."""
    from octseg.infer.predict import load_pullback_frames

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
    # the overlay (the service never sends pixels back)
    frames = load_pullback_frames(cfg.dcm_path)
    base = os.path.splitext(os.path.basename(cfg.dcm_path))[0]
    width = len(str(frames.shape[0]))
    header = None
    done = 0
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
            log.info('server wall: %.1f s', rec['seconds'])
    return done


@entry_point('client')
def main(cfg: Config) -> None:
    run(cfg)


if __name__ == '__main__':
    main()
