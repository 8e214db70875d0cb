"""Disney BSDF: pdf normalization, sampler/pdf consistency, reciprocity."""
import numpy as np
import jax
import jax.numpy as jnp

from tpuray.integrator import disney
from tpuray.integrator.disney import ShadeMaterial


def make_mat(n=1, **kw):
    d = dict(emissive=(0, 0, 0), base_color=(0.8, 0.6, 0.4), subsurface=0.0,
             metallic=0.0, specular=0.5, specular_tint=0.0, roughness=0.5,
             sheen=0.0, sheen_tint=0.5, clearcoat=0.0, clearcoat_gloss=1.0,
             anisotropic=0.0)
    d.update(kw)
    def arr(v):
        a = np.asarray(v, np.float32)
        if a.ndim == 0:
            return jnp.full((n,), a)
        return jnp.broadcast_to(jnp.asarray(a), (n, 3))
    return ShadeMaterial(
        emissive=arr(d["emissive"]), base_color=arr(d["base_color"]),
        subsurface=arr(d["subsurface"]), metallic=arr(d["metallic"]),
        specular=arr(d["specular"]), specular_tint=arr(d["specular_tint"]),
        roughness=arr(d["roughness"]), sheen=arr(d["sheen"]),
        sheen_tint=arr(d["sheen_tint"]), clearcoat=arr(d["clearcoat"]),
        clearcoat_gloss=arr(d["clearcoat_gloss"]),
        anisotropic=arr(d["anisotropic"]))


def hemisphere_grid(n_theta=64, n_phi=128):
    """Directions + solid-angle weights covering the +z hemisphere."""
    th = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    ph = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    t, p = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], -1)
    w = np.sin(t) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)
    return d.reshape(-1, 3).astype(np.float32), w.reshape(-1).astype(np.float32)


def test_pdf_integrates_to_one():
    n_up = jnp.asarray([0.0, 0.0, 1.0])
    v = jnp.asarray([np.sin(0.4), 0.0, np.cos(0.4)], dtype=jnp.float32)
    dirs, w = hemisphere_grid()
    for kw in [dict(), dict(roughness=0.2), dict(metallic=0.9, roughness=0.3),
               dict(clearcoat=1.0, clearcoat_gloss=0.5)]:
        mat = make_mat(len(dirs), **kw)
        p = disney.pdf(jnp.broadcast_to(v, (len(dirs), 3)),
                       jnp.broadcast_to(n_up, (len(dirs), 3)),
                       jnp.asarray(dirs), mat)
        integral = float(jnp.sum(p * jnp.asarray(w)))
        assert abs(integral - 1.0) < 0.05, f"pdf integral {integral} for {kw}"


def test_sampler_consistent_with_pdf():
    """MC estimate of \\int cos dw via the sampler/pdf matches quadrature."""
    rng = np.random.default_rng(7)
    n = 200_000
    n_up = jnp.asarray([0.0, 0.0, 1.0])
    v = jnp.asarray([np.sin(0.3), 0.0, np.cos(0.3)], dtype=jnp.float32)
    mat = make_mat(n, roughness=0.4, metallic=0.3)
    xi = rng.random((3, n)).astype(np.float32)
    l = disney.sample(jnp.asarray(xi[0]), jnp.asarray(xi[1]), jnp.asarray(xi[2]),
                      jnp.broadcast_to(v, (n, 3)), jnp.broadcast_to(n_up, (n, 3)), mat)
    ndotl = np.asarray(l[..., 2])
    p = np.asarray(disney.pdf(jnp.broadcast_to(v, (n, 3)),
                              jnp.broadcast_to(n_up, (n, 3)), l, mat))
    valid = (ndotl > 0) & (p > 1e-8)
    est = np.where(valid, ndotl / np.maximum(p, 1e-8), 0.0).mean()

    dirs, w = hemisphere_grid()
    ref = float(np.sum(dirs[:, 2] * w))  # = pi
    # sampler loses the below-horizon reflect() tail; expect within ~10%
    assert abs(est - ref) / ref < 0.1, f"MC {est} vs quad {ref}"


def test_eval_reciprocity_and_positivity():
    rng = np.random.default_rng(3)
    n = 256
    nrm = jnp.asarray([0.0, 0.0, 1.0])
    def rand_hemi():
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 0.05
        return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    v, l = rand_hemi(), rand_hemi()
    mat = make_mat(n, roughness=0.6, metallic=0.2, sheen=0.5, clearcoat=0.3)
    nb = jnp.broadcast_to(nrm, (n, 3))
    f_vl = np.asarray(disney.evaluate(v, nb, l, mat))
    f_lv = np.asarray(disney.evaluate(l, nb, v, mat))
    assert (f_vl >= 0).all()
    np.testing.assert_allclose(f_vl, f_lv, rtol=1e-4, atol=1e-6)


def test_eval_zero_below_horizon():
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    l_below = jnp.asarray([[0.0, 0.5, -0.86]])
    mat = make_mat(1)
    f = np.asarray(disney.evaluate(v, nrm, l_below, mat))
    np.testing.assert_array_equal(f, 0.0)
    p = np.asarray(disney.pdf(v, nrm, l_below, mat))
    np.testing.assert_array_equal(p, 0.0)


def test_grad_wrt_material_finite():
    """Autodiff through evaluate w.r.t. material params is finite & nonzero."""
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.3, 0.0, 0.95]]) / np.linalg.norm([0.3, 0, 0.95])
    l = jnp.asarray([[-0.2, 0.1, 0.97]]) / np.linalg.norm([-0.2, 0.1, 0.97])

    def loss(rough, base):
        mat = make_mat(1, roughness=float("nan"))._replace(
            roughness=rough, base_color=base)
        return jnp.sum(disney.evaluate(v, nrm, l, mat))

    g_r, g_b = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray([0.5]), jnp.asarray([[0.8, 0.6, 0.4]]))
    assert np.isfinite(np.asarray(g_r)).all()
    assert np.isfinite(np.asarray(g_b)).all()
    assert float(jnp.abs(g_b).sum()) > 0


def test_aniso_reduces_to_isotropic_at_zero():
    """evaluate_aniso(aniso=0) == evaluate() with matched Smith-G alpha.

    The reference's isotropic G uses alphaG=roughness while the aniso
    branch uses roughness^2 (path_tracing.frag:570-593); pick roughness=1
    where the conventions coincide, plus a direct GTR2 check at any r."""
    rs = np.random.RandomState(0)
    n = 64
    v = _rand_dirs(rs, n, up=True)
    l = _rand_dirs(rs, n, up=True)
    nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    x = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    y = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    mat = make_mat(n, roughness=1.0, metallic=0.3, clearcoat=0.4)
    f_iso = disney.evaluate(jnp.asarray(v), jnp.asarray(nrm), jnp.asarray(l), mat)
    f_an = disney.evaluate_aniso(jnp.asarray(v), jnp.asarray(nrm), jnp.asarray(l),
                                 jnp.asarray(x), jnp.asarray(y), mat)
    np.testing.assert_allclose(np.asarray(f_an), np.asarray(f_iso),
                               rtol=2e-4, atol=1e-5)


def test_gtr2_aniso_matches_gtr2_when_axes_equal():
    rs = np.random.RandomState(1)
    h = _rand_dirs(rs, 128, up=True)
    a = jnp.asarray(0.37, jnp.float32)
    ndoth = jnp.asarray(h[:, 2])
    d_iso = disney.gtr2(ndoth, a)
    d_an = disney.gtr2_aniso(ndoth, jnp.asarray(h[:, 0]), jnp.asarray(h[:, 1]), a, a)
    np.testing.assert_allclose(np.asarray(d_an), np.asarray(d_iso), rtol=1e-4)


def test_aniso_stretches_highlight():
    """ax != ay: density at H tilted toward x vs y must differ."""
    mat = make_mat(1, roughness=0.3, anisotropic=0.8)
    ax, ay = disney.aniso_alphas(mat)
    assert float(ax[0]) > float(ay[0])
    tilt = np.float32(0.3)
    c = np.sqrt(1 - tilt * tilt)
    hx = jnp.asarray([tilt]); hz = jnp.asarray([c]); z0 = jnp.asarray([0.0])
    d_x = disney.gtr2_aniso(hz, hx, z0, ax, ay)
    d_y = disney.gtr2_aniso(hz, z0, hx, ax, ay)
    assert float(d_x[0]) > float(d_y[0])


def _rand_dirs(rs, n, up=False):
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if up:
        d[:, 2] = np.abs(d[:, 2]) + 0.05
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def test_evaluate_pdf_matches_separate_calls():
    rs = np.random.RandomState(2)
    n = 128
    v = _rand_dirs(rs, n, up=True)
    l = _rand_dirs(rs, n)  # include below-horizon directions
    nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    mat = make_mat(n, roughness=0.25, metallic=0.5, clearcoat=0.7,
                   sheen=0.3, subsurface=0.2)
    f0 = disney.evaluate(jnp.asarray(v), jnp.asarray(nrm), jnp.asarray(l), mat)
    p0 = disney.pdf(jnp.asarray(v), jnp.asarray(nrm), jnp.asarray(l), mat)
    f1, p1 = disney.evaluate_pdf(jnp.asarray(v), jnp.asarray(nrm), jnp.asarray(l), mat)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=1e-6, atol=1e-8)


def test_evaluate_frame_matches_evaluate_aniso():
    """The wired-in per-lane aniso path (evaluate(..., frame=)) must equal
    the standalone evaluate_aniso oracle on aniso lanes and plain
    evaluate() on anisotropic == 0 lanes."""
    rs = np.random.RandomState(5)
    n = 128
    v = jnp.asarray(_rand_dirs(rs, n, up=True))
    l = jnp.asarray(_rand_dirs(rs, n, up=True))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    an = jnp.asarray((np.arange(n) % 2).astype(np.float32) * 0.8)
    mat = make_mat(n, roughness=0.3, metallic=0.4)._replace(anisotropic=an)

    f_w = np.asarray(disney.evaluate(v, nrm, l, mat, frame=(x, y)))
    f_iso = np.asarray(disney.evaluate(v, nrm, l, mat))
    f_an = np.asarray(disney.evaluate_aniso(v, nrm, l, x, y, mat))
    am = np.asarray(an) > 0
    np.testing.assert_allclose(f_w[~am], f_iso[~am], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(f_w[am], f_an[am], rtol=1e-5, atol=1e-7)
    # the aniso result must actually differ from isotropic on aniso lanes
    assert np.abs(f_w[am] - f_iso[am]).max() > 1e-4

    # evaluate_pdf / pdf route through the same core
    f2, p2 = disney.evaluate_pdf(v, nrm, l, mat, frame=(x, y))
    np.testing.assert_allclose(np.asarray(f2), f_w, rtol=1e-6, atol=1e-8)
    p3 = disney.pdf(v, nrm, l, mat, frame=(x, y))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p3), rtol=1e-6,
                               atol=1e-8)
    # iso lanes keep the isotropic density
    p_iso = np.asarray(disney.pdf(v, nrm, l, mat))
    np.testing.assert_allclose(np.asarray(p2)[~am], p_iso[~am], rtol=1e-5)


def test_aniso_sampler_consistent_with_pdf():
    """MC estimate of \\int cos dw via the ANISO sampler/pdf pair matches
    quadrature — asserts the sample_gtr2_aniso density really is
    gtr2_aniso * ndoth / (4 ldoth) as the mixed pdf assumes."""
    rng = np.random.default_rng(11)
    n = 200_000
    n_up = jnp.asarray([0.0, 0.0, 1.0])
    v = jnp.asarray([np.sin(0.3), 0.0, np.cos(0.3)], dtype=jnp.float32)
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    mat = make_mat(n, roughness=0.4, metallic=0.6, anisotropic=0.8)
    xi = rng.random((3, n)).astype(np.float32)
    vb = jnp.broadcast_to(v, (n, 3))
    nb = jnp.broadcast_to(n_up, (n, 3))
    l = disney.sample(jnp.asarray(xi[0]), jnp.asarray(xi[1]),
                      jnp.asarray(xi[2]), vb, nb, mat, frame=(x, y))
    ndotl = np.asarray(l[..., 2])
    p = np.asarray(disney.pdf(vb, nb, l, mat, frame=(x, y)))
    valid = (ndotl > 0) & (p > 1e-8)
    est = np.where(valid, ndotl / np.maximum(p, 1e-8), 0.0).mean()
    assert abs(est - np.pi) / np.pi < 0.1, f"MC {est} vs pi"


def test_precompute_view_paths_match():
    """evaluate_pre / evaluate_pdf_pre must equal the unshared evaluators
    exactly (same op structure; XLA folds the rest)."""
    import numpy as np
    from tpuray.integrator import disney

    rng = np.random.default_rng(12)
    n_pts = 256
    n = rng.normal(size=(n_pts, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.normal(size=(n_pts, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    l = rng.normal(size=(n_pts, 3)).astype(np.float32)
    l /= np.linalg.norm(l, axis=-1, keepdims=True)
    u = lambda a, b: jnp.asarray(rng.uniform(a, b, n_pts).astype(np.float32))
    mat = disney.ShadeMaterial(
        emissive=jnp.zeros((n_pts, 3)),
        base_color=jnp.asarray(rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)),
        subsurface=u(0, 1), metallic=u(0, 1), specular=u(0, 1),
        specular_tint=u(0, 1), roughness=u(0.02, 1), sheen=u(0, 1),
        sheen_tint=u(0, 1), clearcoat=u(0, 1), clearcoat_gloss=u(0.1, 1))
    v = jnp.asarray(v); n = jnp.asarray(n); l = jnp.asarray(l)

    pre = disney.precompute_view(v, n, mat)
    f0 = np.asarray(disney.evaluate(v, n, l, mat))
    f1 = np.asarray(disney.evaluate_pre(pre, v, n, l, mat))
    np.testing.assert_allclose(f0, f1, rtol=1e-6, atol=1e-7)

    f2, p2 = disney.evaluate_pdf(v, n, l, mat)
    f3, p3 = disney.evaluate_pdf_pre(pre, v, n, l, mat)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f3), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p3), rtol=1e-6,
                               atol=1e-7)
