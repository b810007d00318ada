"""ILT operator library tests: analytic transform pairs, jit/vmap/grad
cleanliness, sphere roundtrips, and the high-level laplace_reconstruct.

These are the unit tests the reference lacks (SURVEY.md §4): the ILT there is
an external dependency (torchlaplace, called at reference w_nl.py:136-145).
Accuracy target from BASELINE.md: reconstruction MSE <= 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.ops import (
    complex_to_spherical,
    spherical_to_complex,
    inverse_laplace,
    ilt_query_points,
    ilt_combine,
    laplace_reconstruct,
)
from neurallaplacecontrol_tpu.ops.ilt import effective_terms

TS = jnp.linspace(0.05, 4.0, 40, dtype=jnp.float64)

PAIRS = {
    "exp": (lambda s: 1.0 / (s + 1.0), lambda t: np.exp(-t)),
    "sin": (lambda s: 1.0 / (s**2 + 1.0), lambda t: np.sin(t)),
    "ramp": (lambda s: 1.0 / s**2, lambda t: t),
    "damped_cos": (
        lambda s: (s + 1.0) / ((s + 1.0) ** 2 + 4.0),
        lambda t: np.cos(2.0 * t) * np.exp(-t),
    ),
}


@pytest.mark.parametrize("alg,terms,tol", [
    ("dehoog", 17, 1e-8),
    ("dehoog", 33, 1e-8),
    ("fixed_talbot", 17, 1e-5),
    ("fixed_talbot", 33, 1e-5),
    ("euler", 33, 1e-8),
    ("stehfest", 16, 1e-2),
])
@pytest.mark.parametrize("pair", list(PAIRS))
def test_analytic_pairs(alg, terms, tol, pair):
    F, f_true = PAIRS[pair]
    f = np.asarray(inverse_laplace(F, TS, terms=terms, algorithm=alg))
    mse = float(np.mean((f - f_true(np.asarray(TS))) ** 2))
    assert mse <= tol, f"{alg}({terms}) on {pair}: mse={mse}"


def test_north_star_accuracy():
    """BASELINE.md: ILT reconstruction MSE <= 1e-5 on all pairs."""
    for name, (F, f_true) in PAIRS.items():
        f = np.asarray(inverse_laplace(F, TS, terms=33, algorithm="dehoog"))
        mse = float(np.mean((f - f_true(np.asarray(TS))) ** 2))
        assert mse <= 1e-5, f"{name}: {mse}"


def test_fourier_is_linear_fixed_basis():
    """The fourier combine is a fixed linear map of Re/Im F — the property the
    NL model trains through (any basis error is absorbed by the learned F)."""
    t = TS[:8]
    terms = 17
    s = ilt_query_points(t, terms, "fourier")
    F1 = 1.0 / (s + 1.0)
    F2 = 1.0 / (s**2 + 1.0)
    a, b = 0.7, -1.3
    lhs = ilt_combine(a * F1 + b * F2, t, terms, "fourier")
    rhs = a * ilt_combine(F1, t, terms, "fourier") + b * ilt_combine(F2, t, terms, "fourier")
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-10)


def test_fourier_convergence_with_terms():
    """Truncated fourier error decays as terms grow (O(1/N))."""
    F, f_true = PAIRS["sin"]
    errs = []
    for terms in (17, 65, 257):
        f = np.asarray(inverse_laplace(F, TS, terms=terms, algorithm="fourier"))
        errs.append(float(np.mean((f - f_true(np.asarray(TS))) ** 2)))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-4


@pytest.mark.parametrize("alg", ["fourier", "dehoog", "stehfest", "fixed_talbot", "euler", "cme"])
def test_jit_vmap_consistency(alg):
    F = PAIRS["exp"][0]
    terms = 17

    def single(t):
        return inverse_laplace(F, t, terms=terms, algorithm=alg)

    direct = single(TS)
    jitted = jax.jit(single)(TS)
    vmapped = jax.vmap(lambda t: single(t[None])[0])(TS)
    # stehfest's large alternating weights amplify reduction-order rounding
    tol = 1e-5 if alg == "stehfest" else 1e-8
    np.testing.assert_allclose(np.asarray(direct), np.asarray(jitted), rtol=tol, atol=1e-12)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(vmapped), rtol=tol, atol=1e-10)


def test_grad_through_fourier():
    """Gradients flow through the ILT to parameters of F (training path)."""

    def loss(a):
        def F(s):
            return 1.0 / (s + a)

        f = inverse_laplace(F, TS, terms=17, algorithm="fourier")
        return jnp.sum(f**2)

    g = jax.grad(loss)(1.5)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_sphere_roundtrip(key):
    z = jax.random.normal(key, (64,), dtype=jnp.float64) + 1j * jax.random.normal(
        jax.random.fold_in(key, 1), (64,), dtype=jnp.float64
    )
    theta, phi = complex_to_spherical(z)
    assert np.all(np.abs(np.asarray(theta)) <= np.pi)
    assert np.all(np.abs(np.asarray(phi)) <= np.pi / 2)
    z2 = spherical_to_complex(theta, phi)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), rtol=1e-9, atol=1e-9)


def test_laplace_reconstruct_shapes_and_values():
    """laplace_reconstruct with an oracle rep_fn reproduces f(t) per dim.

    rep_fn returns the sphere coordinates of the true F at the query points,
    so reconstruction must match direct inversion — checks the wiring of
    sphere maps + combine that the NL model uses (reference w_nl.py:117-145).
    """
    B, D, terms = 12, 3, 33
    t = jnp.linspace(0.1, 2.0, B, dtype=jnp.float64)
    decay = jnp.asarray([0.5, 1.0, 2.0], dtype=jnp.float64)

    def rep_fn(theta_s, phi_s, p):
        s = spherical_to_complex(theta_s, phi_s)  # [B, terms]
        F = 1.0 / (s[:, None, :] + decay[None, :, None])  # [B, D, terms]
        return complex_to_spherical(F)

    p = jnp.zeros((B, 4), dtype=jnp.float64)
    out = laplace_reconstruct(rep_fn, p, t, recon_dim=D, algorithm="dehoog", terms=terms)
    assert out.shape == (B, D)
    expected = np.exp(-np.asarray(decay)[None, :] * np.asarray(t)[:, None])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)

    # [B,1]-shaped times (reference call shape, w_nl.py:136-145)
    out2 = laplace_reconstruct(rep_fn, p, t[:, None], recon_dim=D, algorithm="dehoog", terms=terms)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))


def test_f32_path_finite():
    """f32 (TPU default) stays finite and close to f64 for moderate terms."""
    t32 = TS.astype(jnp.float32)
    F = PAIRS["damped_cos"][0]
    f32 = np.asarray(inverse_laplace(F, t32, terms=17, algorithm="fourier"))
    f64 = np.asarray(inverse_laplace(F, TS, terms=17, algorithm="fourier"))
    assert np.all(np.isfinite(f32))
    np.testing.assert_allclose(f32, f64, atol=5e-3)


def test_sphere_near_pole_f32_finite():
    """Regression (r5): f32 rounds sin(phi) to exactly 1.0 for phi within
    ~5.6e-4 of the pole — INSIDE the 1e-4 clip margin — so the literal
    cos(phi)/(1 - sin(phi)) cancelled to inf/NaN. dehoog-ILT training
    saturates phi that far (observed pi/2 - 2.4e-4); the half-angle form
    must stay finite and respect the documented |s| <= ~2e4 bound."""
    half_pi = np.float32(np.pi / 2)
    phi = jnp.asarray(
        [half_pi - 2.4e-4, half_pi - 1.2e-4, -(half_pi - 2.4e-4), 0.0],
        jnp.float32,
    )
    theta = jnp.asarray([0.3, 2.0, -1.0, half_pi], jnp.float32)
    s = spherical_to_complex(theta, phi)
    assert s.dtype == jnp.complex64
    sn = np.asarray(s)
    assert np.all(np.isfinite(sn.real)) and np.all(np.isfinite(sn.imag))
    # clip engages at pi/2 - 1e-4 -> radius tops out near 2/margin = 2e4
    assert np.abs(sn).max() <= 2.1e4
    # f64 agrees with the f32 magnitudes to f32 precision away from the clip
    s64 = np.asarray(spherical_to_complex(theta.astype(jnp.float64), phi.astype(jnp.float64)))
    np.testing.assert_allclose(np.abs(sn[0]), np.abs(s64[0]), rtol=1e-3)


def test_dehoog_degenerate_inputs_finite():
    """The QD rails: exact-zero and near-zero coefficients (raw network
    outputs, not true transforms) make the quotient-difference ratios
    singular; the railed recursion must return finite values in f32 AND
    finite gradients (the trainer's zero_nans should be a backstop, not
    the steady state)."""
    terms = 17
    n = effective_terms(terms, "dehoog")
    rng = np.random.default_rng(3)
    F = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))).astype(np.complex64)
    F[0, 3] = 0.0  # exact zero denominator in q = a[r+1]/a[r]
    F[1] = 1e-30  # denormal-range row
    F[2, ::2] = 1e6  # wild magnitude alternation
    t = jnp.asarray(rng.uniform(0.05, 2.0, (8,)), jnp.float32)
    out = ilt_combine(jnp.asarray(F), t, terms, "dehoog")
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(Fr, Fi):
        return jnp.sum(ilt_combine(Fr + 1j * Fi, t, terms, "dehoog") ** 2)

    gr, gi = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(F.real), jnp.asarray(F.imag)
    )
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.all(np.isfinite(np.asarray(gi)))


def test_cme_converges_on_held_out_pair():
    """The CME construction must be convergent: held-out reconstruction
    error decreases monotonically with the order, and is accurate in
    absolute terms (regression: the old kernel diverged with terms)."""
    t = jnp.linspace(0.05, 4.0, 100)
    true = 0.5 * jnp.exp(-0.2 * t) * jnp.sin(2 * t)  # not used in calibration

    def F(s):
        return 0.5 * 2.0 / ((s + 0.2) ** 2 + 4.0)

    errs = []
    for terms in (9, 17, 33, 101):
        f = inverse_laplace(F, t, terms, "cme")
        errs.append(float(jnp.mean((f - true) ** 2)))
    assert errs == sorted(errs, reverse=True), errs
    # r3 multi-phase calibration (scripts/calibrate_cme.py): measured
    # 1.3e-4 at 17 terms, 6.2e-7 at 101 (bounds ~5x margin)
    assert errs[1] < 7e-4, errs  # 17 terms
    assert errs[-1] < 5e-6, errs  # 101 terms


def test_cme_accuracy_bounds_quantified():
    """Stated accuracy bounds for the Horvath-Telek multi-phase CME
    (VERDICT r2 item 3): held-out transform pairs NEVER part of the
    calibration objective (the SCV is function-independent), at the
    flagship's term count (17 -> order 8) and at 41 terms. Measured (f64,
    scripts/calibrate_cme.py table): 8.5e-7 / 1.2e-4 / 8.3e-6 at 17 terms,
    2.1e-8 / 3.2e-6 / 1.5e-7 at 41 — a 6-100x improvement over the r2
    single-phase construction (5e-6..7e-4 / 5e-7..8e-5).

    Why cos(t) sits at ~1e-4 at 17 terms and cannot do better: the CME ILT
    is E[f(tX)] for a unit-mean density X, so the leading error is
    (SCV/2) t^2 f''(t); with the order-17 SCV-optimal 0.00721 that
    predicts MSE ~ (SCV/2)^2 E[t^4 cos^2 t] ~ 9e-5 — the measured 1.2e-4
    IS the method's floor, not a calibration gap (see
    test_cme_error_matches_scv_floor). All three pairs are <=1e-5 from 33
    terms up. A least-squares-weights variant (the overfitting shortcut)
    remains rejected: held-out 1/sqrt(s) degraded from 7e-5 to 1e+2 in the
    round-2 evaluation. Use dehoog (<=1e-10 at 17 terms) when ILT accuracy
    itself is the point."""
    t = jnp.linspace(0.1, 3.0, 200)
    pairs = [
        (lambda s: 1 / (s + 1) ** 2, t * jnp.exp(-t), 3e-6, 1e-7),
        (lambda s: s / (s * s + 1), jnp.cos(t), 4e-4, 1e-5),
        (lambda s: 1 / jnp.sqrt(s), 1 / jnp.sqrt(jnp.pi * t), 3e-5, 5e-7),
    ]
    for F, true, bound17, bound41 in pairs:
        e17 = float(jnp.mean((inverse_laplace(F, t, 17, "cme") - true) ** 2))
        e41 = float(jnp.mean((inverse_laplace(F, t, 41, "cme") - true) ** 2))
        assert e17 < bound17, (e17, bound17)
        assert e41 < bound41, (e41, bound41)
        # and the gap vs dehoog is real: dehoog crushes it at 17 terms
        ed = float(jnp.mean((inverse_laplace(F, t, 17, "dehoog") - true) ** 2))
        assert ed < 1e-10, ed
    # <=1e-5 across ALL held-out pairs from 33 terms (VERDICT r2 item 3
    # target, met at the next valid order above the flagship's 17)
    for F, true, _, _ in pairs:
        e33 = float(jnp.mean((inverse_laplace(F, t, 33, "cme") - true) ** 2))
        assert e33 < 1e-5, e33


def test_cme_scv_matches_published_anchors():
    """The calibrated table reproduces the published method's landmarks:
    the order-3 optimum SCV 0.200902 (Horvath-Telek, known to 6 digits),
    monotone SCV decay, and the ~2/N^2 law (N = 2n+1)."""
    from neurallaplacecontrol_tpu.ops._cme_table import CME_PARAMS

    scvs = {n: v[0] for n, v in CME_PARAMS.items()}
    assert abs(scvs[1] - 0.200902) < 1e-5, scvs[1]
    ns = sorted(scvs)
    assert all(scvs[a] > scvs[b] for a, b in zip(ns, ns[1:])), "SCV must decrease"
    for n in (4, 8, 16, 20):
        N = 2 * n + 1
        assert 1.0 / N**2 < scvs[n] < 3.0 / N**2, (n, scvs[n])


def test_cme_error_matches_scv_floor():
    """The measured cos(t) error at 17 terms matches the second-moment
    prediction MSE ~ ((SCV/2) t^2 f'')^2 within 3x — evidence that the
    calibration has reached the method's intrinsic floor rather than
    leaving accuracy on the table."""
    from neurallaplacecontrol_tpu.ops._cme_table import CME_PARAMS

    scv = CME_PARAMS[8][0]
    t = jnp.linspace(0.1, 3.0, 200)
    true = jnp.cos(t)
    measured = float(jnp.mean((inverse_laplace(
        lambda s: s / (s * s + 1), t, 17, "cme") - true) ** 2))
    predicted = float(jnp.mean((0.5 * scv * t**2 * (-jnp.cos(t))) ** 2))
    assert predicted / 3 < measured < predicted * 3, (measured, predicted)


def test_effective_terms_contract():
    """ilt_query_points returns exactly effective_terms nodes per algorithm."""
    from neurallaplacecontrol_tpu.ops.ilt import effective_terms, ilt_query_points

    t = jnp.asarray([0.3, 1.0])
    for alg in ("fourier", "stehfest", "euler", "dehoog", "cme", "fixed_talbot"):
        for req in (16, 17):
            eff = effective_terms(req, alg)
            s = ilt_query_points(t, req, alg)
            assert s.shape == (2, eff), (alg, req, s.shape)


def test_nl_model_every_algorithm_builds(key):
    """Regression: stehfest (even nodes) / euler / dehoog with the default
    17-term request used to crash the NL forward with a width mismatch."""
    from neurallaplacecontrol_tpu.models import make_model

    for alg in ("fourier", "stehfest", "euler", "dehoog", "cme", "fixed_talbot"):
        model = make_model(
            "nl", "oderl-pendulum", 3, 1, 2.0,
            Config(nl_ilt_algorithm=alg, nl_s_recon_terms=17), dtype=jnp.float64,
        )
        params = model.init(key)
        out = model.apply(
            params,
            jnp.zeros((2, 3)),
            jnp.zeros((2, 4, 1)),
            jnp.full((2, 1), 0.05),
        )
        assert out.shape == (2, 3) and bool(jnp.isfinite(out).all()), alg
