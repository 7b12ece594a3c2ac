"""FedDG FFT-augmentation parity vs the reference's numpy formulas
(data/ImageLoader.py:161-208), re-stated here test-only with the internal
random ratio draw made explicit."""
import jax.numpy as jnp
import numpy as np

from ccst_tpu.ops.fft_aug import low_freq_mutate, source_to_target_freq


def ref_low_freq_mutate_np(amp_src, amp_trg, L, ratio):
    # ImageLoader.py:161-183 with `ratio = np.random.randint(1,10)/10`
    # replaced by the passed value (the only difference)
    a_src = np.fft.fftshift(amp_src, axes=(-2, -1))
    a_trg = np.fft.fftshift(amp_trg, axes=(-2, -1))
    _, h, w = a_src.shape
    b = (np.floor(np.amin((h, w)) * L)).astype(int)
    c_h = np.floor(h / 2.0).astype(int)
    c_w = np.floor(w / 2.0).astype(int)
    h1, h2 = c_h - b, c_h + b + 1
    w1, w2 = c_w - b, c_w + b + 1
    a_src[:, h1:h2, w1:w2] = (
        a_src[:, h1:h2, w1:w2] * ratio + a_trg[:, h1:h2, w1:w2] * (1 - ratio)
    )
    return np.fft.ifftshift(a_src, axes=(-2, -1))


def ref_source_to_target_freq(src_img, amp_trg, L, ratio):
    # ImageLoader.py:185-208
    src = src_img.transpose((2, 0, 1))
    fft_src = np.fft.fft2(src, axes=(-2, -1))
    amp_src, pha_src = np.abs(fft_src), np.angle(fft_src)
    amp_mut = ref_low_freq_mutate_np(amp_src, amp_trg, L, ratio)
    out = np.real(np.fft.ifft2(amp_mut * np.exp(1j * pha_src), axes=(-2, -1)))
    return out.transpose(1, 2, 0)


def test_low_freq_mutate_matches_reference(rng):
    for L in (0.0, 0.1):
        for ratio in (0.1, 0.5, 0.9):
            a = rng.random((3, 17, 16)).astype(np.float32) * 10
            b = rng.random((3, 17, 16)).astype(np.float32) * 10
            want = ref_low_freq_mutate_np(a.copy(), b.copy(), L, ratio)
            got = np.asarray(low_freq_mutate(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(ratio), L=L))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_source_to_target_freq_matches_reference(rng):
    img = (rng.random((22, 22, 3)).astype(np.float32) * 255.0)
    trg = (rng.random((22, 22, 3)).astype(np.float32) * 255.0)
    amp_trg = np.abs(
        np.fft.fft2(trg.transpose(2, 0, 1), axes=(-2, -1))
    ).astype(np.float32)
    for L in (0.0, 0.1):
        for ratio in (0.3, 0.7):
            want = ref_source_to_target_freq(img.copy(), amp_trg.copy(), L, ratio)
            got = np.asarray(source_to_target_freq(
                jnp.asarray(img), jnp.asarray(amp_trg), jnp.asarray(ratio), L=L
            ))
            # ours clips to [0, 255] (the reference clips at the caller,
            # ImageLoader.py:323) — compare pre-clip range
            np.testing.assert_allclose(
                got, np.clip(want, 0.0, 255.0), rtol=2e-4, atol=2e-3
            )
