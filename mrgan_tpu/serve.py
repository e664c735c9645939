"""Material-classifier serving: train once, snapshot, classify pokes.

The reference discards every trained model after printing a scalar error
(SURVEY.md §5 "no model checkpoints whatsoever"). For deployment this module
packages the semi-supervised GAN's discriminator (its 6-way head IS the
material classifier) together with the StandardScaler statistics and the
modality/frontend configuration into one artifact:

    clf = fit_classifier(x, y, modality=5)       # or from a DeviceDataset
    clf.save("clf.ckpt"); clf = MaterialClassifier.load("clf.ckpt")
    names = clf.classify(features)               # -> material names
    probs = clf.predict_proba(features)

``classify_pokes`` runs raw windows through the on-device frontend
(ops.features/ops.mel) before classification, so a robot-side caller feeds
sensor windows directly.
"""

import numpy as np
import jax

from . import MATERIALS
from .models import nets
from .ops import features as feat_ops
from .train import gan
from .utils import params_io
from .utils import rng as rng_util


class MaterialClassifier:
    def __init__(self, disc_params, mean, inv_std, modality=None,
                 materials=MATERIALS, valid_dim=None, ft_time=4.0,
                 c_time=0.2):
        self.disc_params = disc_params
        self.mean = np.asarray(mean, np.float32)
        self.inv_std = np.asarray(inv_std, np.float32)
        self.modality = modality
        self.materials = tuple(materials)
        self.valid_dim = valid_dim if valid_dim is not None else len(self.mean)
        # impact-window durations the training features were resampled to
        # (processdata.py's duration/contactAccelLength); classify_raw_poke
        # windows live sensor streams with the same config
        self.ft_time = float(ft_time)
        self.c_time = float(c_time)

        @jax.jit
        def _logits(params, x):
            logits, _ = nets.discriminator_apply(params, x, train=False)
            return logits

        self._logits = _logits

    # -- inference -----------------------------------------------------------

    def _prep(self, x):
        x = np.asarray(x, np.float32)
        d = self.mean.shape[0]
        if x.shape[-1] < d:  # pad to the training-time lane-aligned width
            x = np.pad(x, ((0, 0), (0, d - x.shape[-1])))
        return (x - self.mean) * self.inv_std

    def predict_logits(self, x):
        return np.asarray(self._logits(self.disc_params, self._prep(x)))

    def predict_proba(self, x):
        logits = self.predict_logits(x)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def predict(self, x):
        return self.predict_logits(x).argmax(axis=-1)

    def classify(self, x):
        return [self.materials[i] for i in self.predict(x)]

    def classify_pokes(self, temperature=None, force0=None, force1=None,
                       contact=None):
        """Raw resampled windows -> frontend -> material names."""
        feats = np.asarray(feat_ops.assemble(
            self.modality, temperature=temperature, force0=force0,
            force1=force1, contact=contact))
        return self.classify(feats)

    def classify_raw_poke(self, raw, index=-1):
        """Online robot-side inference: one poke straight from the collection
        stack's save schema (collectdataPoke.py's dataAll batch dict) ->
        impact windowing + lerp resampling at the classifier's trained
        durations (processdata.py:56-83 semantics) -> on-device frontend ->
        material name."""
        from .data import preprocess
        from .ops import features as feat_ops

        # window only the streams this modality's frontend reads — the
        # 48 kHz contact resample dominates and e.g. a force+temp
        # classifier never needs it
        streams = {"force", "temperature", "contact"} if self.modality is \
            None else set(feat_ops.MODALITY_STREAMS[self.modality])
        keys = ["collisionTime"]
        if "force" in streams:
            keys += ["RGripRFingerTime", "RGripRFingerForce"]
        if "temperature" in streams:
            keys += ["temperatureTime", "temperatureRaw"]
        if "contact" in streams:
            keys += ["contactmicTime", "contactmic"]
        one = {key: [raw[key][index]] for key in keys}
        w = preprocess.process_sequences(one, self.ft_time, self.c_time,
                                         streams=streams)

        def arr(name):
            return (np.asarray(w[name], np.float32)
                    if name in w else None)

        return self.classify_pokes(
            temperature=arr("temperature"), force0=arr("force0"),
            force1=arr("force1"), contact=arr("contact"))[0]

    # -- persistence ----------------------------------------------------------

    def save(self, path):
        return params_io.save(path, {
            "disc": self.disc_params,
            "mean": self.mean,
            "inv_std": self.inv_std,
            "modality": np.int32(-1 if self.modality is None else
                                 self.modality),
            "valid_dim": np.int32(self.valid_dim),
            "ft_time": np.float64(self.ft_time),
            "c_time": np.float64(self.c_time),
        })

    @classmethod
    def load(cls, path):
        blob = params_io.restore(path)
        modality = int(blob["modality"])
        return cls(blob["disc"], blob["mean"], blob["inv_std"],
                   None if modality < 0 else modality,
                   valid_dim=int(blob["valid_dim"]),
                   ft_time=float(blob.get("ft_time", 4.0)),
                   c_time=float(blob.get("c_time", 0.2)))


def fit_classifier(x, y, modality=None, percentlabeled=100,
                   cfg: gan.GanConfig = gan.GanConfig(), seed=0,
                   ft_time=4.0, c_time=0.2):
    """Train the semi-supervised GAN on (x, y) and return a deployable
    classifier (scaler stats fit on the whole provided training set, like a
    final production fit)."""
    from .train import protocol

    rng = np.random.RandomState(seed)
    x = np.asarray(x, np.float32)
    xp, valid_dim = gan.pad_features(x, cfg.pad_multiple)
    # Same near-constant-column guard as the training paths (gan.scale_stats):
    # a production fit on wide audio features can hit columns whose f32 std is
    # pure cancellation noise, and dividing by it amplifies junk ~1e6x (the
    # diagnosed MLP fold-collapse bug).
    mean, inv = (np.asarray(a) for a in gan.scale_stats(xp))
    xs = (xp - mean) * inv

    x_lab, y_lab, x_shuf, _ = protocol.select_labeled(
        xs, np.asarray(y, np.int32), int(10 * percentlabeled),
        cfg.num_classes, rng)
    keys = rng_util.make_keys(seed, 1)
    errs, aux = gan.train_folds(
        keys, x_lab[None], y_lab[None], x_shuf[None],
        xs[:1][None], np.asarray(y[:1], np.int32)[None],  # dummy test
        n_train=len(xs), valid_dim=valid_dim, cfg=cfg, with_params=True)
    disc = jax.tree.map(lambda a: np.asarray(a[0]), aux["params"]["disc"])
    return MaterialClassifier(disc, mean, inv, modality,
                              valid_dim=valid_dim, ft_time=ft_time,
                              c_time=c_time)
