"""Frontend parity tests.

The STFT conventions (framing, reflect pad, window padding, DFT sign)
are cross-checked against ``torch.stft`` from torch core — the same
primitive torchaudio's transforms are built on (reference:
src/frontends.py). Filterbank/DCT matrices are checked against
independent numpy constructions of torchaudio's published formulas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaa_tpu.ops import filterbanks as fb
from adaa_tpu.ops import frontends
from adaa_tpu.ops import stft as stft_ops

torch = pytest.importorskip("torch")


def _rand_wave(rng, batch=2, length=16000):
    return (rng.standard_normal((batch, length)) * 0.1).astype(np.float32)


class TestSTFT:
    @pytest.mark.parametrize("window_kind", ["hann", "ones"])
    def test_matches_torch_stft(self, rng, window_kind):
        x = _rand_wave(rng)
        n_fft, hop, win = 512, 160, 400

        if window_kind == "hann":
            t_window = torch.hann_window(win)
        else:
            t_window = None
        ref = torch.stft(
            torch.from_numpy(x),
            n_fft=n_fft,
            hop_length=hop,
            win_length=win,
            window=t_window,
            return_complex=True,
        )
        real, imag = stft_ops.stft(
            jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win,
            window=window_kind,
        )
        np.testing.assert_allclose(
            np.asarray(real), ref.real.numpy(), atol=2e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(imag), ref.imag.numpy(), atol=2e-3, rtol=1e-4
        )

    def test_frame_count(self):
        assert stft_ops.frame_count(64600, 512, 160) == 404

    def test_differentiable(self, rng):
        x = jnp.asarray(_rand_wave(rng, batch=1, length=4000))
        g = jax.grad(lambda w: jnp.sum(stft_ops.spectrogram(w)))(x)
        assert g.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_custom_vjp_matches_naive_gradient(self, rng):
        """The closed-form STFT backward must equal autodiff of a naive
        gather-based implementation."""
        n_fft, hop, win = 64, 16, 48
        x = jnp.asarray(_rand_wave(rng, batch=2, length=500))
        kern = stft_ops._dft_kernel(n_fft, win, "hann")[:, 0, :]  # (2F, n_fft)

        def naive(w):
            pad = n_fft // 2
            xp = jnp.pad(w, ((0, 0), (pad, pad)), mode="reflect")
            t = 1 + (xp.shape[-1] - n_fft) // hop
            idx = (jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :])
            frames = xp[:, idx]  # (B, T, n_fft)
            return jnp.einsum("btn,fn->bft", frames, jnp.asarray(kern))

        def ours(w):
            real, imag = stft_ops.stft(w, n_fft=n_fft, hop_length=hop,
                                       win_length=win)
            return jnp.concatenate([real, imag], axis=1)

        # forwards agree
        np.testing.assert_allclose(
            np.asarray(ours(x)), np.asarray(naive(x)), atol=1e-4
        )
        # cotangent-weighted grads agree
        key = jax.random.PRNGKey(0)
        ct = jax.random.normal(key, ours(x).shape)
        g_ours = jax.grad(lambda w: jnp.sum(ours(w) * ct))(x)
        g_naive = jax.grad(lambda w: jnp.sum(naive(w) * ct))(x)
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_naive), atol=1e-4
        )

    @pytest.mark.parametrize(
        "n_fft,hop,win,length",
        [
            (512, 160, 400, 64_600),  # production LFCC/MFCC geometry
            (64, 16, 48, 500),        # hop | n_fft
            (60, 16, 48, 500),        # hop does not divide n_fft
            (64, 16, 48, 503),        # wave length not hop-aligned
        ],
    )
    def test_chunked_form_matches_conv_form(self, rng, n_fft, hop, win,
                                            length):
        """The chunked reformulation (bf16 fast-path default on TPU)
        must equal the validated strided-conv form — exercised here in
        f32 on CPU, where both forms share kernels and accumulate f32.
        """
        x = jnp.asarray(_rand_wave(rng, batch=2, length=length))
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

        conv_fn = stft_ops._windowed_dft_fn(n_fft, hop, win, "hann",
                                            "f32", "conv")
        chunk_fn = stft_ops._windowed_dft_fn(n_fft, hop, win, "hann",
                                             "f32", "chunked")
        ref = conv_fn(xp)
        got = chunk_fn(xp)
        assert got.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5 * scale)

        ct = jax.random.normal(jax.random.PRNGKey(0), ref.shape)
        g_ref = jax.grad(lambda w: jnp.sum(conv_fn(w) * ct))(xp)
        g_got = jax.grad(lambda w: jnp.sum(chunk_fn(w) * ct))(xp)
        gscale = float(jnp.max(jnp.abs(g_ref)))
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=2e-5 * gscale)


class TestFilterbanks:
    def test_linear_fbank_properties(self):
        mat = fb.linear_fbanks(257, 0.0, 8000.0, 128, 16000)
        assert mat.shape == (257, 128)
        # triangles peak at 1 and partition frequencies
        assert mat.max() <= 1.0 + 1e-6
        assert (mat >= 0).all()
        # interior frequencies are covered by at least one filter
        coverage = mat[3:-3].sum(axis=1)
        assert (coverage > 0).all()

    def test_mel_htk_roundtrip(self):
        f = np.array([0.0, 100.0, 1000.0, 8000.0])
        np.testing.assert_allclose(fb.mel_to_hz(fb.hz_to_mel(f)), f, rtol=1e-9)

    def test_dct_orthonormal(self):
        # ortho DCT-II: columns orthonormal under the n_mels inner product
        d = fb.create_dct(80, 128, norm="ortho").astype(np.float64)  # (128, 80)
        gram = d.T @ d
        np.testing.assert_allclose(gram, np.eye(80), atol=1e-5)

    def test_amplitude_to_db(self):
        x = jnp.asarray([1.0, 10.0, 1e-20])
        out = np.asarray(fb.amplitude_to_db_power(x))
        np.testing.assert_allclose(out, [0.0, 10.0, -100.0], atol=1e-3)


class TestFilterbankOracleParity:
    """Anti-circularity oracle (VERDICT weak item 1): the production
    matrices in adaa_tpu.ops.filterbanks are compared elementwise
    against an INDEPENDENT torch implementation of torchaudio's
    published constructors (tests/oracles/torch_filterbanks.py — loop-
    built triangles, different code shape), plus analytic spot values
    computed inline from the definitions. A real torchaudio install is
    unavailable in this image; two independent derivations + hand
    arithmetic replace recorded goldens."""

    def test_linear_fbanks_match_oracle(self):
        from oracles import torch_filterbanks as ofb

        ours = fb.linear_fbanks(257, 0.0, 8000.0, 128, 16000)
        ref = ofb.linear_fbanks(257, 0.0, 8000.0, 128, 16000).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_linear_fbank_analytic_spot_value(self):
        # freqs[i] = 31.25*i; pts[j] = 8000*j/129. Filter 0 at freq
        # index 2: rising = 62.5*129/8000 = 1.0078125 > falling =
        # 2 - 1.0078125 = 0.99218750 -> exact triangle value
        mat = fb.linear_fbanks(257, 0.0, 8000.0, 128, 16000)
        assert mat[2, 0] == pytest.approx(0.99218750, abs=1e-6)
        # peak bins: filter m peaks at pts[m+1]; freq index nearest
        # pts[1]=62.0155 is 2 (62.5) — already checked; zero outside
        assert mat[0, 0] == 0.0
        assert mat[200, 0] == 0.0

    def test_melscale_fbanks_match_oracle(self):
        from oracles import torch_filterbanks as ofb

        for norm in (None, "slaney"):
            ours = fb.melscale_fbanks(257, 0.0, 8000.0, 80, 16000, norm=norm)
            ref = ofb.melscale_fbanks(
                257, 0.0, 8000.0, 80, 16000, norm=norm
            ).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=str(norm))

    def test_melscale_analytic_spot_value(self):
        # m_hi = 2595*log10(1+8000/700); pts[1] = 700*(10^(m_hi/2595/81)-1)
        import math

        m_hi = 2595.0 * math.log10(1.0 + 8000.0 / 700.0)
        pts = [700.0 * (10.0 ** (m_hi * j / 81.0 / 2595.0) - 1.0)
               for j in range(3)]
        # frequency bin 2 = 62.5 Hz sits on filter 0's falling edge
        # iff pts[1] < 62.5 < pts[2]
        expected = min(
            (62.5 - pts[0]) / (pts[1] - pts[0]),
            (pts[2] - 62.5) / (pts[2] - pts[1]),
        )
        expected = max(0.0, expected)
        mat = fb.melscale_fbanks(257, 0.0, 8000.0, 80, 16000)
        assert mat[2, 0] == pytest.approx(expected, abs=1e-6)

    def test_create_dct_matches_oracle(self):
        from oracles import torch_filterbanks as ofb

        for norm in ("ortho", None):
            ours = fb.create_dct(80, 128, norm=norm)
            ref = ofb.create_dct(80, 128, norm=norm).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=str(norm))

    def test_create_dct_analytic_spot_values(self):
        import math

        d = fb.create_dct(80, 128, norm="ortho")  # (n_mels=128, n_mfcc=80)
        assert d[0, 0] == pytest.approx(math.sqrt(1.0 / 128.0), abs=1e-7)
        assert d[1, 1] == pytest.approx(
            math.cos(3.0 * math.pi / 256.0) * math.sqrt(2.0 / 128.0), abs=1e-7
        )


class TestFrontends:
    def test_lfcc_shape(self, rng):
        x = jnp.asarray(_rand_wave(rng, batch=2, length=64600))
        out = frontends.lfcc(x)
        assert out.shape == (2, 80, 404)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_mfcc_shape(self, rng):
        x = jnp.asarray(_rand_wave(rng, batch=2, length=64600))
        out = frontends.mfcc(x)
        assert out.shape == (2, 80, 404)

    def test_mel_spec_shape(self, rng):
        x = jnp.asarray(_rand_wave(rng, batch=2, length=64600))
        out = frontends.mel_spec(x)
        assert out.shape == (2, 2, 80, 404)

    def test_lfcc_matches_manual_torch_pipeline(self, rng):
        """End-to-end LFCC against an independent torch-core pipeline
        built ENTIRELY from torch.stft + the independent filterbank
        oracle (no production matrices — anti-circularity)."""
        from oracles import torch_filterbanks as ofb

        x = _rand_wave(rng, batch=1, length=16000)
        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=512,
            hop_length=160,
            win_length=400,
            window=torch.hann_window(400),
            return_complex=True,
        ).abs() ** 2
        filt = ofb.linear_fbanks(257, 0.0, 8000.0, 128, 16000)
        banked = torch.matmul(spec.transpose(-2, -1), filt).transpose(-2, -1)
        banked_db = 10.0 * torch.log10(torch.clamp(banked, min=1e-10))
        dct = ofb.create_dct(80, 128, norm="ortho")
        ref = torch.matmul(banked_db.transpose(-2, -1), dct).transpose(-2, -1)

        out = frontends.lfcc(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-2, rtol=1e-4
        )

    def test_mfcc_matches_manual_torch_pipeline(self, rng):
        """End-to-end MFCC against torch.stft + oracle mel filterbank
        + oracle DCT (torchaudio.transforms.MFCC composition: power
        mel-spectrogram -> AmplitudeToDB('power') -> ortho DCT)."""
        from oracles import torch_filterbanks as ofb

        x = _rand_wave(rng, batch=1, length=16000)
        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=512,
            hop_length=160,
            win_length=400,
            window=torch.hann_window(400),
            return_complex=True,
        ).abs() ** 2
        filt = ofb.melscale_fbanks(257, 0.0, 8000.0, 128, 16000)
        banked = torch.matmul(spec.transpose(-2, -1), filt).transpose(-2, -1)
        banked_db = 10.0 * torch.log10(torch.clamp(banked, min=1e-10))
        dct = ofb.create_dct(80, 128, norm="ortho")
        ref = torch.matmul(banked_db.transpose(-2, -1), dct).transpose(-2, -1)

        out = frontends.mfcc(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-2, rtol=1e-4
        )

    def test_get_frontend_dispatch(self):
        fe = frontends.get_frontend(["lfcc"])
        assert getattr(fe, "func", fe) is frontends.lfcc
        fe = frontends.get_frontend(["mfcc"])
        assert getattr(fe, "func", fe) is frontends.mfcc
        assert frontends.get_frontend(["mel_spec"]) is frontends.mel_spec
        with pytest.raises(ValueError):
            frontends.get_frontend(["bogus"])

    def test_differentiable_through_lfcc(self, rng):
        x = jnp.asarray(_rand_wave(rng, batch=1, length=8000))
        g = jax.grad(lambda w: jnp.sum(frontends.lfcc(w)))(x)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestGoldenVectors:
    """Pinned CPU-f32 frontend outputs: regression guard for any future
    refactor of the STFT/filterbank/DCT pipeline (the EER-parity
    linchpin — SURVEY §7 hard part #1)."""

    def test_frontends_match_golden(self):
        import pathlib

        golden_path = pathlib.Path(__file__).parent / "golden" / \
            "frontends_golden.npz"
        g = np.load(golden_path)
        x = jnp.asarray(g["wave"])
        np.testing.assert_allclose(
            np.asarray(frontends._lfcc_xla(x)), g["lfcc"], atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(frontends.mfcc(x)), g["mfcc"], atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(frontends.mel_spec(x)), g["mel_spec"], atol=1e-2)
