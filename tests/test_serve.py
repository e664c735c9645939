"""Serving tests: fit -> classify -> snapshot roundtrip."""

import numpy as np

from mrgan_tpu import MATERIALS, serve
from mrgan_tpu.data import preprocess, synthetic
from mrgan_tpu.ops import features as feat_ops
from mrgan_tpu.train import gan


def _blobs(n=360, d=40, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 6, n).astype(np.int32)
    centers = rng.randn(6, d) * 3
    return (centers[y] + rng.randn(n, d)).astype(np.float32), y


def test_fit_classify_roundtrip(tmp_path):
    x, y = _blobs()
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=20,
                        pad_multiple=8)
    clf = serve.fit_classifier(x, y, modality=None, percentlabeled=6,
                               cfg=cfg, seed=0)

    x2, y2 = _blobs(seed=1)  # same centers (seed controls noise draw order)
    # evaluate on held-out draws from the training distribution
    acc = float((clf.predict(x) == y).mean())
    assert acc > 0.8, acc
    probs = clf.predict_proba(x[:5])
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    names = clf.classify(x[:3])
    assert all(n in serve.MATERIALS for n in names)

    path = clf.save(str(tmp_path / "clf"))
    clf2 = serve.MaterialClassifier.load(path)
    np.testing.assert_array_equal(clf2.predict(x[:50]), clf.predict(x[:50]))


def test_classify_raw_poke_deployment_loop(tmp_path):
    """The full robot-side serving loop: train on windows preprocessed from
    raw acquisition pickles, deploy, then classify HELD-OUT raw pokes via
    classify_raw_poke (impact windowing + lerp + frontend + discriminator).
    The window durations ride the checkpoint."""
    ft_time, c_time = 0.5, 0.05
    train_w, train_y, test_raw = [], [], []
    for mi, material in enumerate(MATERIALS):
        raw = synthetic.generate_raw_file(seed=mi, material=material, pokes=8)
        w = preprocess.process_sequences(raw, ft_time, c_time)
        train_w.append(w)
        train_y += [mi] * 8
        test_raw.append(
            synthetic.generate_raw_file(seed=100 + mi, material=material,
                                        pokes=1))

    x = np.asarray(feat_ops.assemble(
        2,
        temperature=np.concatenate([np.asarray(w["temperature"], np.float32)
                                    for w in train_w]),
        force0=np.concatenate([np.asarray(w["force0"], np.float32)
                               for w in train_w]),
        force1=np.concatenate([np.asarray(w["force1"], np.float32)
                               for w in train_w])))
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=30, pad_multiple=8)
    clf = serve.fit_classifier(x, np.asarray(train_y, np.int32), modality=2,
                               cfg=cfg, seed=0, ft_time=ft_time, c_time=c_time)

    path = clf.save(str(tmp_path / "clf"))
    clf = serve.MaterialClassifier.load(path)
    assert (clf.ft_time, clf.c_time) == (ft_time, c_time)

    preds = [clf.classify_raw_poke(raw, index=0) for raw in test_raw]
    assert all(p in MATERIALS for p in preds)
    hits = sum(p == m for p, m in zip(preds, MATERIALS))
    assert hits >= 3, preds  # well above the 1/6 chance rate


def test_classify_pokes_through_frontend():
    """Raw resampled windows -> ops.features frontend -> classifier."""
    rng = np.random.RandomState(0)
    n, ft_len = 240, 50
    y = rng.randint(0, 6, n).astype(np.int32)
    centers = rng.randn(6, 2 * ft_len) * 3
    force = centers[y] + rng.randn(n, 2 * ft_len).astype(np.float32)
    force0, force1 = force[:, :ft_len], force[:, ft_len:]

    from mrgan_tpu.ops import features as feat_ops

    x = np.asarray(feat_ops.assemble(0, force0=force0, force1=force1))
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=15, pad_multiple=8)
    clf = serve.fit_classifier(x, y, modality=0, percentlabeled=4, cfg=cfg)
    names = clf.classify_pokes(force0=force0[:10], force1=force1[:10])
    assert len(names) == 10
    acc = float((clf.predict(x) == y).mean())
    assert acc > 0.7, acc
