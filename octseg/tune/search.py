"""Local Bayesian hyperparameter search + HyperBand early termination.

Replaces the reference's W&B server-side sweep scheduler (reference:
src/models/smp/tune.py:25-52 — bayes method, hyperband early_terminate with
s=2, eta=2, min_iter=25) with an in-process implementation: a Gaussian-process
surrogate with expected improvement over one-hot-encoded categorical
parameters, and rung-based early termination.

The search space mirrors configs/tune.yaml: 9 architectures x 9 encoders x
3 optimizers x 4 learning rates x input sizes {512..896 step 128}.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Sequence

import numpy as np


class SearchSpace:
    """Categorical/discrete space with one-hot encoding for the surrogate."""

    def __init__(self, params: Dict[str, Sequence]):
        self.params = {k: list(v) for k, v in params.items()}
        self.names = list(self.params.keys())
        self._dims = [len(self.params[n]) for n in self.names]

    @classmethod
    def from_config(cls, cfg) -> 'SearchSpace':
        input_sizes = list(
            range(cfg.input_size_min, cfg.input_size_max + 1, cfg.input_size_step)
        )
        return cls(
            {
                'architecture': list(cfg.architecture),
                'encoder': list(cfg.encoder),
                'optimizer': list(cfg.optimizer),
                'lr': list(cfg.learning_rate),
                'input_size': input_sizes,
            }
        )

    @property
    def size(self) -> int:
        return int(np.prod(self._dims))

    def sample(self, rng: np.random.Generator) -> Dict:
        return {n: self.params[n][rng.integers(len(self.params[n]))] for n in self.names}

    def encode(self, point: Dict) -> np.ndarray:
        parts = []
        for n in self.names:
            onehot = np.zeros(len(self.params[n]))
            onehot[self.params[n].index(point[n])] = 1.0
            parts.append(onehot)
        return np.concatenate(parts)


class BayesianSearch:
    """GP-EI over the encoded space; random exploration for the first trials."""

    def __init__(self, space: SearchSpace, seed: int = 11, n_random: int = 10,
                 n_candidates: int = 256):
        self.space = space
        self.rng = np.random.default_rng(seed)
        self.n_random = n_random
        self.n_candidates = n_candidates
        self.observed_x: List[np.ndarray] = []
        self.observed_y: List[float] = []
        self._seen = set()

    def suggest(self) -> Dict:
        if len(self.observed_y) < self.n_random:
            point = self._sample_unseen()
        else:
            point = self._suggest_gp()
        self._seen.add(tuple(sorted(point.items())))
        return point

    def _sample_unseen(self) -> Dict:
        for _ in range(100):
            p = self.space.sample(self.rng)
            if tuple(sorted(p.items())) not in self._seen:
                return p
        return self.space.sample(self.rng)

    def _suggest_gp(self) -> Dict:
        try:
            from sklearn.gaussian_process import GaussianProcessRegressor
            from sklearn.gaussian_process.kernels import Matern
        except ImportError:  # pragma: no cover
            return self._sample_unseen()
        x = np.stack(self.observed_x)
        y = np.asarray(self.observed_y)
        gp = GaussianProcessRegressor(
            kernel=Matern(nu=2.5), alpha=1e-4, normalize_y=True,
            random_state=int(self.rng.integers(2**31)),
        )
        gp.fit(x, y)
        best_y = y.max()
        candidates = [self._sample_unseen() for _ in range(self.n_candidates)]
        enc = np.stack([self.space.encode(c) for c in candidates])
        mu, sigma = gp.predict(enc, return_std=True)
        sigma = np.maximum(sigma, 1e-9)
        z = (mu - best_y) / sigma
        from scipy.stats import norm
        ei = (mu - best_y) * norm.cdf(z) + sigma * norm.pdf(z)
        return candidates[int(np.argmax(ei))]

    def observe(self, point: Dict, value: float) -> None:
        self.observed_x.append(self.space.encode(point))
        self.observed_y.append(float(value))
        # points fed from a resumed/warm-started sweep were never suggest()ed
        # here — mark them seen or the sweep re-runs completed configs
        self._seen.add(tuple(sorted(point.items())))


class HyperBand:
    """Rung-based early termination (W&B hyperband semantics: eta=2, rungs at
    min_iter * eta^k; a run is killed at a rung if it is not in the top 1/eta
    of metric values recorded at that rung).

    One instance serves a whole sweep — the rung history accumulates across
    trials (octseg.tune.tune creates it once; should_stop is thread-safe for
    concurrent trials).

    Documented deviation from W&B's server-side scheduler (VERDICT r1 §5):
    the quantile threshold here includes the current run's own value, and no
    decision is made until a rung holds >= eta entries. For small sweeps this
    is slightly more permissive early on (the first eta-1 runs always
    survive a rung); asymptotically the kill rate matches W&B's top-1/eta
    rule. W&B also recomputes thresholds retroactively against *running*
    trials; we only compare against values already recorded at the rung.
    """

    def __init__(self, min_iter: int = 25, eta: int = 2, max_iter: int = 50, s: int = 2):
        self.eta = eta
        self.rungs = []
        r = min_iter
        for _ in range(s + 1):
            if r >= max_iter:
                break
            self.rungs.append(r)
            r *= eta
        self.history: Dict[int, List[float]] = {r: [] for r in self.rungs}
        self._lock = threading.Lock()

    def seed(self, epochs_done: int, metric: float) -> None:
        """Re-populate rung history from a completed trial (sweep resume).
        The trial reached every rung <= epochs_done; its recorded final
        metric stands in for the rung-time metric (tuning_results.csv keeps
        only the final value) — an approximation that restores realistic
        kill thresholds instead of resetting them to an empty population."""
        with self._lock:
            for r in self.rungs:
                if r <= epochs_done:
                    self.history[r].append(float(metric))

    def should_stop(self, epoch: int, metric: float) -> bool:
        if epoch not in self.history:
            return False
        with self._lock:
            rung = self.history[epoch]
            rung.append(metric)
            if len(rung) < self.eta:
                return False
            threshold = np.quantile(rung, 1.0 - 1.0 / self.eta)
        return bool(metric < threshold)
