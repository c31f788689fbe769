"""Mask-bank generation properties (SURVEY §7: 'property-test overlap
statistics'; reference semantics at converter/keras/Masksembles.py:16-116)."""

import numpy as np
import pytest

from bayestpu.kernels import mask_bank


def test_exact_width_and_ones():
    scale, bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=0)
    assert bank.shape == (4, 64)
    # every mask has exactly `active_features` ones
    active = round(64 / (scale * (1 - (1 - 1 / scale) ** 4)))
    assert np.all(bank.sum(axis=1) == active)
    # binary
    assert set(np.unique(bank)) <= {0.0, 1.0}


def test_full_coverage_no_dead_channels():
    _, bank = mask_bank.generation_wrapper(128, 4, 2.0, rng=1)
    # all-zero columns are dropped by construction → full coverage
    assert (bank.sum(axis=0) > 0).all()


def test_deterministic_given_seed():
    _, a = mask_bank.generation_wrapper(32, 4, 2.0, rng=7)
    _, b = mask_bank.generation_wrapper(32, 4, 2.0, rng=7)
    np.testing.assert_array_equal(a, b)


def test_solved_scale_satisfies_identity():
    scale, bank = mask_bank.generation_wrapper(100, 4, 3.0, rng=0)
    m = int(bank.sum(axis=1)[0])
    # m * s * (1 - (1-1/s)^n) == c (the sympy-exact identity, solved numerically)
    assert abs(m * scale * (1 - (1 - 1 / scale) ** 4) - 100) < 0.5


def test_validation_errors():
    with pytest.raises(ValueError):
        mask_bank.generation_wrapper(8, 4, 2.0)   # c < 10
    with pytest.raises(ValueError):
        mask_bank.generation_wrapper(64, 4, 7.0)  # scale > 6


def test_overlap_statistics_scale_effect():
    # larger scale → less overlap between masks (the S param of the paper)
    _, tight = mask_bank.generation_wrapper(120, 4, 1.2, rng=0)
    _, loose = mask_bank.generation_wrapper(120, 4, 4.0, rng=0)
    s_tight = mask_bank.bank_stats(tight)
    s_loose = mask_bank.bank_stats(loose)
    assert s_loose["mean_pair_overlap"] < s_tight["mean_pair_overlap"]
