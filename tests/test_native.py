"""Native C++ splat vs the numpy fallback: bit-level behavioral parity."""

import os

import numpy as np
import pytest

from simplenerf_tpu import native
from simplenerf_tpu.qa import masks


def _numpy_splat(values, trans_pos, depth, mask):
    """Run the pure-numpy path regardless of native availability."""
    os.environ["SIMPLENERF_NO_NATIVE"] = "1"
    try:
        # Reset the module's load cache so the env var is honored.
        native._tried, saved = True, native._lib
        native._lib = None
        out = masks.bilinear_splat(values, trans_pos, depth, mask)
    finally:
        native._lib = saved
        del os.environ["SIMPLENERF_NO_NATIVE"]
    return out


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeSplat:
    def test_matches_numpy(self):
        rng = np.random.default_rng(7)
        h, w, c = 37, 53, 3
        values = rng.uniform(0, 1, (h, w, c))
        # positions scattered inside and slightly outside the canvas
        trans = np.stack(
            [rng.uniform(-3, w + 2, (h, w)), rng.uniform(-3, h + 2, (h, w))], axis=-1
        )
        depth = rng.uniform(0.1, 10.0, (h, w))
        mask = rng.uniform(0, 1, (h, w)) > 0.2

        out_n, valid_n = masks.bilinear_splat(values, trans, depth, mask)
        out_r, valid_r = _numpy_splat(values, trans, depth, mask)
        np.testing.assert_array_equal(valid_n, valid_r)
        np.testing.assert_allclose(out_n, out_r, atol=1e-10)

    def test_integral_positions_quirk(self):
        """Integral positions hit four coincident corners (reference quirk)."""
        h, w = 8, 8
        values = np.ones((h, w, 1))
        trans = np.stack(np.meshgrid(np.arange(w), np.arange(h)), axis=-1).astype(float)
        depth = np.ones((h, w))
        out_n, valid_n = masks.bilinear_splat(values, trans, depth, None)
        out_r, valid_r = _numpy_splat(values, trans, depth, None)
        np.testing.assert_array_equal(valid_n, valid_r)
        np.testing.assert_allclose(out_n, out_r, atol=1e-10)

    def test_mask_computer_end_to_end(self):
        """MaskComputer through the native path equals the numpy path."""
        rng = np.random.default_rng(3)
        h, w = 24, 32
        depth1 = rng.uniform(2.0, 6.0, (h, w))
        depth2 = rng.uniform(2.0, 6.0, (h, w))
        t1 = np.eye(4)
        t2 = np.eye(4)
        t2[0, 3] = 0.2
        k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
        frame = rng.uniform(0, 255, (h, w, 3))
        mc = masks.MaskComputer()
        m_native = mc.compute_mask(frame, depth1, depth2, t1, t2, k, k)
        os.environ["SIMPLENERF_NO_NATIVE"] = "1"
        try:
            native._lib, saved = None, native._lib
            m_numpy = mc.compute_mask(frame, depth1, depth2, t1, t2, k, k)
        finally:
            native._lib = saved
            del os.environ["SIMPLENERF_NO_NATIVE"]
        np.testing.assert_array_equal(m_native, m_numpy)
