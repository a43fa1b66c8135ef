"""Pipeline orchestrator: hash-gated stage DAG (the framework's `dvc repro`).

The reference orchestrates its data-prep chain with DVC (reference:
dvc.yaml:1-58, dvc.lock) — stages with deps/outs, re-run only when input
hashes change. DVC is not available here, so this module implements the same
contract: stages in pipeline.yaml declare cmd/deps/outs; content hashes are
recorded in pipeline.lock; `repro` topologically orders stages by dep/out
edges and re-runs a stage iff its deps, outs, or cmd changed.

Usage: python -m octseg.core.pipeline [stage ...]   (default: all stages)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os
import subprocess
from typing import Dict, List, Optional

import yaml

log = logging.getLogger(__name__)


def _hash_path(path: str) -> Optional[str]:
    """Content hash of a file, or a stable aggregate hash of a directory."""
    if os.path.isfile(path):
        h = hashlib.md5()
        with open(path, 'rb') as f:
            for chunk in iter(lambda: f.read(1 << 20), b''):
                h.update(chunk)
        return h.hexdigest()
    if os.path.isdir(path):
        h = hashlib.md5()
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for name in sorted(files):
                p = os.path.join(root, name)
                rel = os.path.relpath(p, path)
                st = os.stat(p)
                h.update(f'{rel}:{st.st_size}:{int(st.st_mtime)}'.encode())
        return h.hexdigest()
    return None


class Pipeline:
    def __init__(self, pipeline_file: str = 'pipeline.yaml',
                 lock_file: Optional[str] = None):
        with open(pipeline_file) as f:
            spec = yaml.safe_load(f)
        self.stages: Dict[str, dict] = spec['stages']
        self.lock_file = lock_file or os.path.join(
            os.path.dirname(os.path.abspath(pipeline_file)), 'pipeline.lock'
        )
        self.lock: Dict[str, dict] = {}
        if os.path.exists(self.lock_file):
            with open(self.lock_file) as f:
                self.lock = json.load(f)

    def _topo_order(self, targets: Optional[List[str]] = None) -> List[str]:
        producers = {}
        for name, stage in self.stages.items():
            for out in stage.get('outs', []):
                producers[out] = name
        order: List[str] = []
        visiting: set = set()

        def visit(name: str):
            if name in order:
                return
            if name in visiting:
                raise ValueError(f'Pipeline cycle at stage {name!r}')
            visiting.add(name)
            for dep in self.stages[name].get('deps', []):
                for out, producer in producers.items():
                    if dep == out or dep.startswith(out.rstrip('/') + '/'):
                        visit(producer)
            visiting.discard(name)
            order.append(name)

        for name in targets or list(self.stages):
            visit(name)
        return order

    def _stage_state(self, name: str) -> dict:
        stage = self.stages[name]
        return {
            'cmd': stage['cmd'],
            'deps': {d: _hash_path(d) for d in stage.get('deps', [])},
            'outs': {o: _hash_path(o) for o in stage.get('outs', [])},
        }

    def _is_stale(self, name: str) -> bool:
        if name not in self.lock:
            return True
        state = self._stage_state(name)
        locked = self.lock[name]
        if state['cmd'] != locked.get('cmd'):
            return True
        if state['deps'] != locked.get('deps'):
            return True
        if any(h is None for h in state['outs'].values()):
            return True
        if state['outs'] != locked.get('outs'):
            return True
        return False

    def repro(self, targets: Optional[List[str]] = None, force: bool = False) -> List[str]:
        """Run stale stages in dependency order; returns the stages run."""
        ran = []
        for name in self._topo_order(targets):
            if not force and not self._is_stale(name):
                log.info("Stage '%s' didn't change, skipping", name)
                continue
            cmd = self.stages[name]['cmd']
            log.info("Running stage '%s': %s", name, cmd)
            subprocess.run(cmd, shell=True, check=True)
            self.lock[name] = self._stage_state(name)
            with open(self.lock_file, 'w') as f:
                json.dump(self.lock, f, indent=2)
            ran.append(name)
        return ran


def main() -> None:
    logging.basicConfig(level=logging.INFO, format='[%(levelname)s] %(message)s')
    parser = argparse.ArgumentParser(description='Reproduce pipeline stages')
    parser.add_argument('targets', nargs='*', help='stages to reproduce (default all)')
    parser.add_argument('-f', '--force', action='store_true')
    parser.add_argument('--file', default='pipeline.yaml')
    args = parser.parse_args()
    pipeline = Pipeline(args.file)
    ran = pipeline.repro(args.targets or None, force=args.force)
    log.info('Done; %d stage(s) ran', len(ran))


if __name__ == '__main__':
    main()
