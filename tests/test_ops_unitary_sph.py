"""Tests for unitary/paraunitary constructions, SH machinery, and STFT/EDR."""

import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.ops import sph, stft, unitary


def test_orthogonal_from_skew():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 6).astype(np.float32))
    q = unitary.orthogonal_from_skew(x)
    ok, err = unitary.is_unitary(q, max_tol=1e-4)
    assert ok, err


def test_orthogonal_from_skew_batched():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 4, 4).astype(np.float32))
    q = unitary.orthogonal_from_skew(x)
    for k in range(3):
        ok, err = unitary.is_unitary(q[k], max_tol=1e-4)
        assert ok, err


def test_nd_unitary():
    for n in (2, 3, 4):
        alpha = jnp.asarray(
            np.random.RandomState(n).uniform(0, np.pi / 4, n * (n - 1) // 2).astype(
                np.float32
            )
        )
        u = unitary.nd_unitary(alpha, n)
        ok, err = unitary.is_unitary(u, max_tol=1e-5)
        assert ok, err


def test_nd_unitary_zero_angles_is_identity():
    u = unitary.nd_unitary(jnp.zeros(3), 3)
    assert np.allclose(np.asarray(u), np.eye(3), atol=1e-6)


def test_fir_paraunitary():
    n, order = 3, 8
    rng = np.random.RandomState(2)
    u0 = unitary.orthogonal_from_skew(jnp.asarray(rng.randn(n, n).astype(np.float32)))
    v = rng.randn(n, order - 1).astype(np.float32)
    v = v / np.linalg.norm(v, axis=0, keepdims=True)
    poly = unitary.fir_paraunitary(u0, jnp.asarray(v))
    assert poly.shape == (order, n, n)
    ok, err = unitary.is_paraunitary(poly, max_tol=1e-4)
    assert ok, err


def test_matrix_convolution_matches_numpy():
    rng = np.random.RandomState(3)
    a = rng.randn(3, 2, 4)
    b = rng.randn(5, 4, 2)
    c = np.asarray(unitary.matrix_convolution(jnp.asarray(a), jnp.asarray(b)))
    # brute force
    ref = np.zeros((3 + 5 - 1, 2, 2))
    for u in range(3):
        for v in range(5):
            ref[u + v] += a[u] @ b[v]
    assert np.allclose(c, ref, atol=1e-5)


def test_paraunitary_frequency_response_is_unitary_per_bin():
    n, order = 3, 6
    rng = np.random.RandomState(4)
    u0 = unitary.orthogonal_from_skew(jnp.asarray(rng.randn(n, n).astype(np.float32)))
    v = rng.randn(n, order - 1).astype(np.float32)
    v = v / np.linalg.norm(v, axis=0, keepdims=True)
    poly = unitary.fir_paraunitary(u0, jnp.asarray(v))
    z = jnp.exp(1j * jnp.linspace(0.1, 3.0, 7)).astype(jnp.complex64)
    resp = unitary.paraunitary_frequency_response(poly, z)
    for f in range(7):
        m = np.asarray(resp[f])
        assert np.allclose(m @ m.conj().T, np.eye(n), atol=1e-4)


# ------------------------------- spherical ----------------------------------


def test_sh_matrix_tdesign_orthonormality():
    dirs = sph.t_design_directions(5)
    y = sph.sh_matrix(2, dirs[0], dirs[1])
    j = y.shape[0]
    gram = (4 * np.pi / j) * y.T @ y
    assert np.allclose(gram, np.eye(9), atol=1e-10)


def test_sph_filterbank_perfect_reconstruction():
    dirs = sph.t_design_directions(5)
    c_n = sph.maxre_modal_weights(2)
    a, b = sph.design_sph_filterbank(2, dirs[0], dirs[1], c_n, mode="energy")
    # analysis then synthesis recovers SH coefficients
    rng = np.random.RandomState(0)
    x = rng.randn(9, 16)
    sectors = a @ x
    x_rec = b.T @ sectors
    assert np.allclose(x_rec, x, atol=1e-8)
    # energy normalization: diffuse energy preserved on average
    assert np.isclose(np.trace(a.T @ a), 9.0, atol=1e-6)


def test_modal_weights():
    assert np.allclose(sph.cardioid_modal_weights(1), [1.0, 1.0 / 3.0])
    w = sph.maxre_modal_weights(2)
    assert w[0] == 1.0 and np.all(np.diff(w) < 0)
    bw = sph.butterworth_modal_weights(2, k=5, n_c=3)
    assert np.all(bw > 0) and bw[0] == 1.0


def test_sh_rotation_preserves_norm_and_matches_direct_eval():
    rng = np.random.RandomState(5)
    alpha, beta, gamma = rng.uniform(-np.pi, np.pi, 3)
    rot = sph.rotation_matrix_zyz(alpha, beta, gamma)
    rsh = sph.sh_rotation_matrix(2, rot)
    # orthogonality
    assert np.allclose(rsh @ rsh.T, np.eye(9), atol=1e-8)
    # rotating coefficients == evaluating at inverse-rotated directions
    dirs = sph.t_design_directions(5)
    xyz = sph.sph_to_cart(dirs[0], dirs[1])
    y = sph.sh_matrix(2, dirs[0], dirs[1])
    xyz_rot = xyz @ rot  # inverse-rotate the directions
    azi2, col2 = sph.cart_to_sph(xyz_rot)
    y2 = sph.sh_matrix(2, azi2, col2)
    coeffs = rng.randn(9)
    lhs = y2 @ coeffs
    rhs = y @ (rsh @ coeffs)
    assert np.allclose(lhs, rhs, atol=1e-8)


# --------------------------------- STFT/EDR ---------------------------------


def test_stft_shapes_and_parseval():
    fs = 8000.0
    t = 8192
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, t).astype(np.float32))
    s = stft.stft(x, win_size=512, hop_size=256)
    n_frames = t // 256 - 1
    assert s.shape == (2, 257, n_frames)


def test_stft_non_dividing_hop_matches_direct_framing():
    """win % hop != 0: frames must be real windows of the padded signal
    (the gather used to run past the buffer and clamp-duplicate the final
    sample into the last frames)."""
    win, hop, t = 12, 5, 64
    rng = np.random.RandomState(3)
    x = rng.randn(t).astype(np.float32)
    s = np.asarray(stft.stft(jnp.asarray(x), win_size=win, hop_size=hop))
    # direct reference framing on the identically padded signal
    pad = max(0, win - t)
    pad += (-(t + pad - win)) % hop
    xp = np.pad(x, (0, pad))
    n_frames = (len(xp) - win) // hop + 1
    w = np.hanning(win + 1)[:-1].astype(np.float32)  # periodic hann
    ref = np.stack(
        [np.fft.rfft(xp[i * hop : i * hop + win] * w) for i in range(n_frames)],
        axis=-1,
    )
    assert s.shape == ref.shape
    np.testing.assert_allclose(s, ref, atol=1e-4)


def test_edr_is_monotone_decreasing():
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.randn(4096) * np.exp(-np.arange(4096) / 800)).astype(np.float32))
    s = stft.stft(x, win_size=512, hop_size=256)
    edr = np.asarray(stft.edr_from_stft(s, in_db=False))
    assert np.all(np.diff(edr, axis=-1) <= 1e-6)


def test_erb_filterbank():
    fb, freqs = stft.erb_filterbank(32000.0, 4096, 64)
    assert fb.shape == (64, 2049)
    assert np.all(fb >= 0)
    assert len(freqs) == 64
