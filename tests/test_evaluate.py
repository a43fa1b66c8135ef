import json

import pytest

from octseg.train.evaluate import evaluate_model
from tests.test_infer import make_model_dir
from tests.test_train import make_fold


def test_evaluate_model(tmp_path):
    fold = make_fold(str(tmp_path / 'fold'), n_train=4, n_test=4, size=64)
    model_dir = make_model_dir(str(tmp_path), 'LM', ['Lumen'], input_size=64)
    results = evaluate_model(model_dir, fold, batch_size=4)
    assert set(results) == {'Lumen', 'Mean'}
    for metrics in results.values():
        for k in ('dice', 'iou', 'precision', 'recall', 'f1'):
            assert 0.0 <= metrics[k] <= 1.0
    json.dumps(results)
