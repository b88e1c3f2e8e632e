"""Example smoke tests (reference test/test_example.py:14-24): each example
script runs end-to-end with reduced sizes."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_time_series_classification():
    import time_series_classification as ex

    acc = ex.main(num_epochs=2, batch_size=64)
    assert np.isfinite(acc)
    assert acc >= 0.5  # learns at least something in 2 epochs


def test_irregular_data():
    import irregular_data as ex

    pred = ex.main()
    assert np.isfinite(np.asarray(pred)).all()


def test_logsignature_example():
    import logsignature_example as ex

    train_X, train_y = ex.get_data(400, num_samples=32, seed=0)
    test_X, test_y = ex.get_data(400, num_samples=32, seed=1)
    acc, elapsed = ex.train_one(
        2, 20.0, train_X, train_y, test_X, test_y, num_epochs=2
    )
    assert np.isfinite(acc)
