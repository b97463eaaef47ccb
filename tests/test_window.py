"""Window-rule tests vs an independent transcription of natten's C index rule."""

import numpy as np
import pytest

from naf_tpu.ops.window import (
    cross_scale_lr_indices,
    na_gather_indices,
    na_window_start,
    nearest_exact_src_index,
)


def natten_c_window_start(index, length, kernel_size, dilation):
    """natten's get_window_start (csrc commons), transcribed as test oracle."""
    nh = kernel_size // 2
    if dilation <= 1:
        return max(index - nh, 0) + (index + nh >= length) * (length - index - nh - 1)
    ni = index - nh * dilation
    if ni < 0:
        return index % dilation
    if index + nh * dilation >= length:
        imodd = index % dilation
        a = (length // dilation) * dilation
        b = length - a
        if imodd < b:
            return length - b + imodd - 2 * nh * dilation
        return a + imodd - kernel_size * dilation
    return ni


@pytest.mark.parametrize("length,kernel,dilation", [
    (28, 9, 1), (28, 9, 3), (448, 9, 16), (450, 9, 16), (45, 5, 9),
    (63, 7, 9), (100, 3, 33), (9, 9, 1), (2048, 9, 16), (31, 9, 2),
])
def test_window_start_matches_natten_rule(length, kernel, dilation):
    idx = np.arange(length)
    got = na_window_start(idx, length, kernel, dilation)
    ref = np.array(
        [natten_c_window_start(i, length, kernel, dilation) for i in range(length)]
    )
    np.testing.assert_array_equal(got, ref)


def test_window_positions_in_bounds_and_residue():
    for length, kernel, dilation in [(448, 9, 16), (450, 9, 16), (29, 9, 3)]:
        pos = na_gather_indices(length, kernel, dilation)
        assert pos.min() >= 0 and pos.max() < length
        # every window stays in the query's residue class
        res = pos % dilation
        np.testing.assert_array_equal(res, (np.arange(length) % dilation)[:, None] * np.ones((1, kernel), dtype=int))


def test_window_rejects_bad_args():
    with pytest.raises(ValueError):
        na_window_start(np.arange(4), 10, 4, 1)  # even kernel
    with pytest.raises(ValueError):
        na_window_start(np.arange(4), 8, 9, 1)  # too short


def test_cross_scale_exact_ratio_collapses_to_lr_window():
    """When H == r*h, LR windows are k consecutive cells, standard-NA clamped."""
    hk, r, k = 28, 16, 9
    hq = hk * r
    idx = cross_scale_lr_indices(hq, hk, k)
    cell = np.arange(hq) // r
    start = np.clip(cell - k // 2, 0, hk - k)
    expected = start[:, None] + np.arange(k)[None, :]
    np.testing.assert_array_equal(idx, expected)


def test_cross_scale_ragged_ratio_matches_composition():
    """Ragged ratios: composition of upsample index map and window rule."""
    hq, hk, kernel = 100, 13, 5
    d = hq // hk  # 7
    idx = cross_scale_lr_indices(hq, hk, kernel)
    src = nearest_exact_src_index(hk, hq)
    hr_pos = na_gather_indices(hq, kernel, d)
    np.testing.assert_array_equal(idx, src[hr_pos])
    assert idx.min() >= 0 and idx.max() < hk


def test_cross_scale_small_grid_clamps_dilation():
    """Training-time grids smaller than kernel*ratio (e.g. 16^2 targets at
    ratio 2 with kernel 9) clamp to the densest dilation that fits instead
    of failing — the reference's natten path cannot run these at all."""
    hq, hk, kernel = 16, 8, 9
    idx = cross_scale_lr_indices(hq, hk, kernel)
    assert idx.shape == (hq, kernel)
    assert idx.min() >= 0 and idx.max() < hk
    # clamped dilation 1 == composition of upsample map and dense windows
    src = nearest_exact_src_index(hk, hq)
    hr_pos = na_gather_indices(hq, kernel, 1)
    np.testing.assert_array_equal(idx, src[hr_pos])
    # grids the reference CAN run are untouched by the clamp
    ok = cross_scale_lr_indices(32, 16, 9)
    np.testing.assert_array_equal(
        ok, nearest_exact_src_index(16, 32)[na_gather_indices(32, 9, 2)])
