"""Window table and framing/overlap-add tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu import RxParams, derive_geometry
from linrad_tpu.ops.framing import frame_stream, make_tail, overlap_add
from linrad_tpu.ops.windows import make_window, synthesis_weights


class TestWindows:
    def test_sin_powers(self):
        for n in (1, 2, 3, 4):
            w = make_window(256, n)
            x = np.pi * np.arange(256) / 256
            np.testing.assert_allclose(w, np.sin(x) ** n, atol=1e-12)

    def test_symmetry(self):
        for n in (1, 2, 3, 4, 8, 9):
            w = make_window(256, n)
            np.testing.assert_allclose(w[1:], w[1:][::-1], atol=1e-12)

    def test_rect(self):
        assert np.all(make_window(64, 0) == 1.0)

    def test_gauss_erfc_peak(self):
        # special windows peak at centre near 1 (fft0.c:831-859)
        for n in (8, 9):
            w = make_window(512, n)
            assert w[256] == pytest.approx(1.0, abs=1e-2)
            assert w[0] < 1e-8


class TestFraming:
    def test_frames_cover_stream(self):
        size, hop = 16, 10
        tail = make_tail(size, hop, dtype=jnp.float32)
        block = jnp.arange(40, dtype=jnp.float32)
        frames, new_tail = frame_stream(tail, block, size, hop)
        assert frames.shape == (4, 16)
        # first frame: 6 zeros (tail) then block[0:10]
        np.testing.assert_array_equal(np.asarray(frames[0, 6:]),
                                      np.arange(10))
        # frame 1 overlaps frame 0 by size-hop samples
        np.testing.assert_array_equal(np.asarray(frames[1][: size - hop]),
                                      np.asarray(frames[0][hop:]))
        np.testing.assert_array_equal(np.asarray(new_tail),
                                      np.arange(34, 40))

    def test_streaming_equals_batch(self):
        # two small steps == one big step
        size, hop = 32, 24
        x = np.random.default_rng(0).normal(size=96).astype(np.float32)
        tail = make_tail(size, hop, dtype=jnp.float32)
        f1, tail = frame_stream(tail, jnp.asarray(x[:48]), size, hop)
        f2, _ = frame_stream(tail, jnp.asarray(x[48:]), size, hop)
        tail0 = make_tail(size, hop, dtype=jnp.float32)
        fall, _ = frame_stream(tail0, jnp.asarray(x), size, hop)
        np.testing.assert_allclose(np.concatenate([f1, f2]), fall)

    def test_overlap_add_inverts_framing(self):
        # frame then OLA with rectangular frames at full hop == identity
        size, hop = 16, 16
        x = np.random.default_rng(1).normal(size=64).astype(np.float32)
        tail = make_tail(size, hop, dtype=jnp.float32)
        frames, _ = frame_stream(tail, jnp.asarray(x), size, hop)
        out, carry = overlap_add(frames, hop, jnp.zeros(0, jnp.float32))
        np.testing.assert_allclose(np.asarray(out), x, rtol=1e-6)

    def test_overlap_add_streaming_equals_batch(self):
        rng = np.random.default_rng(2)
        n, size, hop = 8, 24, 10
        frames = rng.normal(size=(n, size)).astype(np.float32)
        ov = size - hop
        out_full, carry_full = overlap_add(jnp.asarray(frames), hop,
                                           jnp.zeros(ov, jnp.float32))
        o1, c = overlap_add(jnp.asarray(frames[:5]), hop,
                            jnp.zeros(ov, jnp.float32))
        o2, c2 = overlap_add(jnp.asarray(frames[5:]), hop, c)
        np.testing.assert_allclose(
            np.concatenate([o1, o2]), np.asarray(out_full), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(carry_full),
                                   rtol=1e-5)


class TestSynthesisWeights:
    @pytest.mark.parametrize("sinpow", [0, 1, 2, 3, 4])
    def test_windowed_ola_reconstructs(self, sinpow):
        """Windowed frames * synthesis weights overlap-added == original.

        This is the invariant behind both the timf2 back-transform
        (timf2.c:970-1160) and the mix1 overlap-add (mix1.c:141-280)."""
        g = derive_geometry(RxParams(first_fft_sinpow=sinpow,
                                     fft1_n_override=8))
        size = g.fft1_size
        hop = g.fft1_new_points
        w = make_window(size, sinpow)
        s = synthesis_weights(size, g.fft1_interleave_points, sinpow)
        rng = np.random.default_rng(3)
        x = rng.normal(size=hop * 12)
        nfr = 12 - (size // hop)
        frames = np.stack([x[b * hop: b * hop + size] * w
                           for b in range(nfr)])
        out = np.zeros(hop * 12)
        for b in range(nfr):
            out[b * hop: b * hop + size] += frames[b] * s
        # interior samples (skip warm-up and tail edges) reconstruct exactly
        lo = size
        hi = (nfr - 1) * hop
        np.testing.assert_allclose(out[lo:hi], x[lo:hi], rtol=1e-6,
                                   atol=1e-9)
