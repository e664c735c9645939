"""Tests for the variant family: WGAN-LP-CT, resnet/biLSTM baselines,
autoencoder pretraining, activation maps, spectrometer utils."""

import numpy as np
import jax
import jax.numpy as jnp

from mrgan_tpu.data import spectrometer
from mrgan_tpu.models import nets, variant_nets as vnets
from mrgan_tpu.train import gan as gan_mod
from mrgan_tpu.train import optim
from mrgan_tpu.variants import activation_maps, autoencoder, baselines, wgan


def _blobs(n=360, d=30, seed=0, classes=6):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, n).astype(np.int32)
    centers = rng.randn(classes, d) * 3
    x = (centers[y] + rng.randn(n, d)).astype(np.float32)
    return x, y


def test_wgan_cell_learns_blobs():
    x, y = _blobs()
    cfg = wgan.WganConfig(noise_size=8, batch_size=16, epochs=15,
                          disc_width=64, pad_multiple=1)
    errs = wgan.run_wgan_cell(x, y, percent_labeled=0.5, cfg=cfg, seed=0,
                              n_splits=3)
    assert errs.shape == (3,)
    assert np.all(np.isfinite(errs))
    assert np.mean(errs) < 0.4


def test_resnn_learns_blobs():
    x, y = _blobs(seed=2)
    acc = baselines.learn_resnn(
        x[:300], y[:300], x[300:], y[300:],
        cfg=baselines.ResNNConfig(epochs=40, batch_size=32), seed=0)
    assert acc > 0.7


def test_bilstm_shapes_and_keras_semantics():
    # hard_sigmoid matches keras clip(0.2x+0.5, 0, 1)
    x = jnp.linspace(-5, 5, 11)
    np.testing.assert_allclose(
        np.asarray(vnets.hard_sigmoid(x)),
        np.clip(0.2 * np.asarray(x) + 0.5, 0, 1), atol=1e-6)

    params = vnets.bilstm_classifier_init(jax.random.PRNGKey(0), 6, units=4,
                                          layers=3)
    out = vnets.bilstm_classifier_apply(params, jnp.ones((5, 12)), layers=3)
    assert out.shape == (5, 6)

    # bidirectional returns fwd/bwd concat; reversing input swaps halves
    p = vnets.bilstm_init(jax.random.PRNGKey(1), 1, 3)
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 1))
    h = vnets.bilstm_apply(p, xs, return_sequences=False)
    p_sw = {"fwd": p["bwd"], "bwd": p["fwd"]}
    h_rev = vnets.bilstm_apply(p_sw, jnp.flip(xs, 1), return_sequences=False)
    np.testing.assert_allclose(np.asarray(h[:, :3]), np.asarray(h_rev[:, 3:]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h[:, 3:]), np.asarray(h_rev[:, :3]),
                               atol=1e-5)

    # return_sequences=True time alignment (Keras Bidirectional): the
    # backward half at step t is the bwd LSTM's state after consuming
    # x[T-1..t] — i.e. the bwd LSTM run FORWARD on the flipped input,
    # then un-flipped. Regression for an extra jnp.flip that misaligned
    # the backward half.
    hs = vnets.bilstm_apply(p, xs, return_sequences=True)
    hb_want = jnp.flip(
        vnets.lstm_apply(p["bwd"], jnp.flip(xs, 1), reverse=False,
                         return_sequences=True), 1)
    np.testing.assert_allclose(np.asarray(hs[..., 3:]), np.asarray(hb_want),
                               atol=1e-5)
    # and the final-step semantics agree with return_sequences=False
    np.testing.assert_allclose(np.asarray(hs[:, -1, :3]), np.asarray(h[:, :3]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs[:, 0, 3:]), np.asarray(h[:, 3:]),
                               atol=1e-6)


def test_bilstm_learns_tiny_sequences():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 200).astype(np.int32)
    # class 1 = rising ramp, class 0 = falling; easy sequence task
    t = np.linspace(-1, 1, 8)
    x = np.where(y[:, None] == 1, t, -t) + 0.1 * rng.randn(200, 8)
    acc = baselines.learn_bilstm(
        x[:150].astype(np.float32), y[:150], x[150:].astype(np.float32),
        y[150:], cfg=baselines.BiLstmConfig(epochs=30, batch_size=32,
                                            units=4, layers=2, num_classes=2))
    assert acc > 0.8


def test_svm_and_rf_baselines():
    x, y = _blobs(seed=3)
    for kernel in range(5):
        acc = baselines.learn_svm(x[:300], y[:300], x[300:], y[300:], kernel)
        assert acc > 0.6, kernel
    assert baselines.learn_rf(x[:300], y[:300], x[300:], y[300:]) > 0.6


def test_autoencoder_gan_cell():
    x, y = _blobs(n=240, d=40, seed=4)
    errs = autoencoder.run_ae_gan_cell(
        x, y, percentlabeled=4,
        ae_cfg=autoencoder.AeConfig(nodes=(32, 16), epochs=20),
        gan_cfg=gan_mod.GanConfig(noise_size=8, batch_size=10, epochs=10,
                                  pad_multiple=1),
        seed=0, n_splits=2)
    assert errs.shape == (2,)
    assert np.all(np.isfinite(errs))


def test_activation_maps_find_planted_features():
    """Port of others/test_activation_map.py:9-57: plant class-dependent
    values at features y+2..y+4 and check the saliency highlights them."""
    rng = np.random.RandomState(0)
    n, num_classes, d = 3000, 5, 10
    y = rng.randint(0, num_classes, n)
    x = rng.rand(n, d).astype(np.float32)
    for i, yy in enumerate(y):
        x[i, yy + 2] = 0.1
        x[i, yy + 3] = 0.2
        x[i, yy + 4] = 0.3
    y1h = np.eye(num_classes, dtype=np.float32)[y]

    widths = (64, 64)
    params = nets.mlp_init(jax.random.PRNGKey(0), d, num_classes, widths)
    opt = optim.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            logits = nets.mlp_apply(p, xb, train=False, widths=widths)
            return jnp.mean(jnp.square(jax.nn.sigmoid(logits) - yb))

        grads = jax.grad(loss_fn)(params)
        return optim.update(grads, opt, params, lr=1e-3, b1=0.9)

    for epoch in range(30):
        perm = rng.permutation(n)
        for s in range(0, n, 128):
            sl = perm[s : s + 128]
            params, opt = step(params, opt, x[sl], y1h[sl])

    def fwd(p, xi):
        return jax.nn.sigmoid(
            nets.mlp_apply(p, xi[None], train=False, widths=widths)[0]
        )

    test_n = 50
    cams = activation_maps.saliency(fwd, params, x[:test_n], y1h[:test_n])
    cams = np.asarray(cams)
    planted = np.zeros((test_n, d), bool)
    for i in range(test_n):
        planted[i, y[i] + 2 : y[i] + 5] = True
    assert cams[planted].mean() > cams[~planted].mean()


def test_spectrometer_preprocess():
    rng = np.random.RandomState(0)
    wavelengths = np.linspace(300, 900, 50)
    x = np.exp(rng.rand(8, 50) + 1.0)

    # deriv1 matches the reference's per-row loop semantics
    got, _, _ = spectrometer.preprocess_spectra(x, np.zeros(8), wavelengths,
                                                deriv_log="deriv1")
    want = np.empty_like(x)
    for i, row in enumerate(x):
        dx = np.zeros_like(row)
        dx[:-1] = np.diff(row) / np.diff(wavelengths)
        dx[-1] = (row[-1] - row[-2]) / (wavelengths[-1] - wavelengths[-2])
        want[i] = dx
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # uv/ir band selection
    uv, _, wl_uv = spectrometer.preprocess_spectra(x, np.zeros(8), wavelengths,
                                                   uvir="uv")
    assert np.all(wl_uv < 400) and uv.shape[1] == wl_uv.size

    # log1
    logd, _, _ = spectrometer.preprocess_spectra(x, np.zeros(8), wavelengths,
                                                 deriv_log="log1")
    np.testing.assert_allclose(logd, np.log(x), rtol=1e-6)


def test_process_lumini_dataset_filters():
    rows = [
        ["wood", "oak", 100] + [1.0] * 6 + [2.0] * 6,
        ["wood", "oak", 50] + [9.0] * 12,       # wrong exposure
        ["metal", "steel", 100] + [3.0] * 6 + [4.0] * 6,
        ["glass", "pane", 100] + [5.0] * 12,    # material not requested
    ]
    X, y = spectrometer.process_lumini_dataset(
        rows, ["wood", "metal"], [["oak"], ["steel"]], sample_count=5,
        exposure=100)
    assert y == [0, 1]
    assert X[0] == [1.0] * 6  # corrected half


def test_load_lumini_dataset_files(tmp_path):
    """File-layout parsing (util.py:4-26): material/object dirs, original +
    sensitivity-corrected blocks split by a marker line."""
    base = tmp_path / "lumini"
    for material, obj in (("wood", "oak"), ("metal", "steel")):
        d = base / material / obj
        d.mkdir(parents=True)
        lines = ["header"]
        lines += [f"{300 + 10 * i}\t{1.0 + i}" for i in range(4)]
        lines += ["sensitivity corrected"]
        lines += [f"{300 + 10 * i}\t{2.0 + i}" for i in range(4)]
        (d / f"scan_1_100.txt").write_text("\n".join(lines))

    data, wavelengths = spectrometer.load_lumini_dataset(str(base))
    assert len(data) == 2
    np.testing.assert_allclose(wavelengths, [300, 310, 320, 330])
    row = next(r for r in data if r[0] == "wood")
    assert row[1] == "oak" and row[2] == 100
    assert row[3:7] == [1.0, 2.0, 3.0, 4.0]      # original
    assert row[7:] == [2.0, 3.0, 4.0, 5.0]       # corrected


def test_ganlstm_cell_learns_blobs():
    """The 'ganlstm' algorithm (wganlpctsemi.py:384-388): biLSTM disc, gan
    labeled loss, output-logit feature matching. Must learn separable blobs."""
    rng = np.random.RandomState(5)
    y = np.tile(np.arange(6, dtype=np.int32), 40)  # balanced -> equal folds
    centers = rng.randn(6, 16) * 3
    x = (centers[y] + rng.randn(240, 16)).astype(np.float32)
    cfg = wgan.ganlstm_config(noise_size=8, batch_size=16, epochs=50,
                              pad_multiple=1)
    assert cfg.algo == "ganlstm" and cfg.arch == "lstm"
    errs = wgan.run_wgan_cell(x, y, percent_labeled=0.5, cfg=cfg, seed=0,
                              n_splits=3)
    assert errs.shape == (3,)
    assert np.all(np.isfinite(errs))
    assert np.mean(errs) < 0.4


def test_gan_algo_uses_feature_matching_and_learns():
    rng = np.random.RandomState(6)
    y = np.tile(np.arange(6, dtype=np.int32), 40)  # balanced -> equal folds
    centers = rng.randn(6, 16) * 3
    x = (centers[y] + rng.randn(240, 16)).astype(np.float32)
    cfg = wgan.WganConfig(algo="gan", noise_size=8, batch_size=16, epochs=15,
                          disc_width=32, pad_multiple=1)
    errs = wgan.run_wgan_cell(x, y, percent_labeled=0.5, cfg=cfg, seed=0,
                              n_splits=3)
    assert np.all(np.isfinite(errs))
    assert np.mean(errs) < 0.4


def test_generate_lumini_roundtrip(tmp_path):
    """The synthetic Lumini writer produces files the real parser loads:
    consistent wavelength grid, exposure parsed from the filename, material
    classes separable, and higher exposure -> higher SNR (the grid's
    exposure dimension has signal to select on)."""
    base = str(tmp_path / "lumini")
    written = spectrometer.generate_lumini_dataset(
        base, seed=0, objects_per_material=2, samples_per_object=3,
        exposures=(100, 500), n_wavelengths=40)
    assert len(written) == 6 * 2 * 3 * 2
    data, wavelengths = spectrometer.load_lumini_dataset(base)
    assert len(data) == len(written) and wavelengths.shape == (40,)

    from mrgan_tpu import MATERIALS

    objs = spectrometer.lumini_objects(data, MATERIALS, sample_count=3,
                                       exposure=100)
    assert len(objs) == 12
    for o in objs.values():
        assert o["x"].shape == (3, 40) and o["y"].shape == (3,)

    # lumini_objects serves the genuinely corrected block: reflectance
    # scale (~O(1)), invariant to exposure — not exposure-scaled counts
    objs500 = spectrometer.lumini_objects(data, MATERIALS, sample_count=3,
                                          exposure=500)
    m100 = np.mean([o["x"].mean() for o in objs.values()])
    m500 = np.mean([o["x"].mean() for o in objs500.values()])
    assert 0.05 < m100 < 5.0 and 0.5 < m500 / m100 < 2.0, (m100, m500)

    # nearest-centroid separability well above 1/6 chance
    x = np.concatenate([o["x"] for o in objs.values()])
    y = np.concatenate([o["y"] for o in objs.values()])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = np.stack([x[y == c].mean(0) for c in range(6)])
    acc = np.mean(np.argmin(
        ((x[:, None] - cents[None]) ** 2).sum(-1), -1) == y)
    assert acc > 0.6

    # corrected spectra (second half) divide out exposure, so repeats of one
    # object vary less at exposure 500 than at 100
    def corrected_std(exposure):
        rows = [r for r in data
                if r[0] == "plastic" and r[1] == "plasticobj0"
                and r[2] == exposure]
        arr = np.asarray([r[3:] for r in rows])
        return np.std(arr[:, arr.shape[1] // 2:], axis=0).mean()

    assert corrected_std(500) < corrected_std(100)


def test_generate_scio_roundtrip(tmp_path):
    """SCiO writer -> loader -> per-object dicts: spectrum vs double-width
    spectrum_raw semantics (wganlpctsemi.py:675-677), classes separable."""
    base = str(tmp_path / "scio")
    written = spectrometer.generate_scio_dataset(
        base, seed=0, objects_per_material=2, samples_per_object=3,
        n_wavelengths=40)
    assert len(written) == 6 * 2 * 3
    data, wl = spectrometer.load_scio_dataset(base)
    assert len(data) == 36 and wl.shape == (40,)

    from mrgan_tpu import MATERIALS

    objs = spectrometer.scio_objects(data, MATERIALS, sample_count=3)
    assert len(objs) == 12
    for o in objs.values():
        assert o["x"].shape == (3, 40)
    objs_raw = spectrometer.scio_objects(data, MATERIALS, sample_count=3,
                                         spectrum_raw="spectrum_raw")
    for o in objs_raw.values():
        assert o["x"].shape == (3, 80)  # processed + raw stacked

    # process_scio_dataset filter/cap semantics
    X, y = spectrometer.process_scio_dataset(
        data, ["wood", "metal"], [["woodobj0"], ["metalobj1"]],
        sample_count=2)
    assert y == [1, 1, 0, 0] or sorted(y) == [0, 0, 1, 1]
    assert all(len(r) == 40 for r in X)

    # double-width rows differentiate per half under preprocess
    x0 = objs_raw["plasticobj0"]["x"]
    got, _, _ = spectrometer.preprocess_spectra(
        x0, np.zeros(len(x0)), wl, deriv_log="deriv1", double_data=True)
    assert got.shape == x0.shape

    # nearest-centroid separability well above 1/6 chance
    x = np.concatenate([o["x"] for o in objs.values()])
    yv = np.concatenate([o["y"] for o in objs.values()])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = np.stack([x[yv == c].mean(0) for c in range(6)])
    acc = np.mean(np.argmin(
        ((x[:, None] - cents[None]) ** 2).sum(-1), -1) == yv)
    assert acc > 0.6, acc
