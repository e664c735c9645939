"""MREO dataset loading — the reference's ``dataset()`` (mr_gan.py:23-71),
rebuilt around the batched on-device frontend.

Differences from the reference (behavior-preserving, performance-relevant):
- the per-example librosa mel-spectrogram loop (mr_gan.py:42-47) becomes ONE
  batched GEMM-native ops.mel.logmel call over all pokes of a material;
- python-2 pickles are read with ``encoding='latin1'`` (as the reference's own
  py3 port does at others/mr_nn_activation_map_py3.py:33);
- a synthetic in-memory source (data.synthetic) is used when the processed
  pickles are absent, so table protocols run hermetically.

Output contract matches the reference exactly: ``(X, y)`` float arrays, or a
``{objName: {'x','y'}}`` dict when ``leave_object_out`` — with the same
modality encodings and ``log_S.flatten()`` ordering.
"""

import os
import pickle

import numpy as np

from .. import MATERIALS
from ..ops import features as feat_ops
from ..ops import mel as mel_ops
from . import synthetic

PROCESSED_FMT = "processed_0.1sbefore_%s_times_%.2f_%.2f.pkl"


def processed_path(data_dir, material, forcetemp_time, contactmic_time):
    return os.path.join(
        data_dir, PROCESSED_FMT % (material, forcetemp_time, contactmic_time)
    )


def have_processed(data_dir, forcetemp_time=4, contactmic_time=0.2):
    return all(
        os.path.exists(processed_path(data_dir, m, forcetemp_time, contactmic_time))
        for m in MATERIALS
    )


def _normalize_keys(obj):
    """Python-2 pickles can surface dict keys as bytes depending on how they
    were written; normalize to str so downstream indexing is uniform."""
    if isinstance(obj, dict):
        return {
            (k.decode("latin1") if isinstance(k, bytes) else k):
                _normalize_keys(v)
            for k, v in obj.items()
        }
    return obj


def _load_material(data_dir, material, forcetemp_time, contactmic_time):
    with open(
        processed_path(data_dir, material, forcetemp_time, contactmic_time), "rb"
    ) as f:
        return _normalize_keys(pickle.load(f, encoding="latin1"))


def _material_batches(obj_data):
    """Normalize one object's entry to dense float32 arrays."""
    out = {}
    for k in ("temperature", "force0", "force1", "contact"):
        if k in obj_data:
            out[k] = np.asarray(obj_data[k], np.float32)
    return out


# One-slot memo for the synthetic source: a table sweep calls load_features
# once per modality against the SAME generated set (mr_gan.py:248-250 loads
# per modality too, but the reference reads pickles; here each call would
# re-synthesize 7200 pokes of 48 kHz audio). Keyed by every generate_processed
# argument; a with_contact=True synthesis also serves later audio-free
# requests (superset — the audio uses a separate RNG, so force/temperature
# draws are identical either way, see synthetic.generate_processed).
_MEMO = {"key": None, "with_contact": False, "value": None}


def _generate_processed_memo(seed, forcetemp_time, contactmic_time,
                             with_contact=True, **kw):
    key = (synthetic.GENERATOR_VERSION, seed, forcetemp_time,
           contactmic_time, tuple(sorted(kw.items())))
    if _MEMO["key"] == key and (_MEMO["with_contact"] or not with_contact):
        return _MEMO["value"]
    value = synthetic.generate_processed(
        seed=seed, forcetemp_time=forcetemp_time,
        contactmic_time=contactmic_time, with_contact=with_contact, **kw)
    _MEMO.update(key=key, with_contact=with_contact, value=value)
    return value


def load_features(modalities=0, forcetemp_time=4, contactmic_time=0.2,
                  leave_object_out=False, data_dir="data_processed",
                  synthetic_seed=None, verbose=False, deriv=False,
                  batch_size=512, synthetic_kwargs=None):
    """dataset() equivalent. If the processed pickles are missing (or
    ``synthetic_seed`` is given), a synthetic MREO set is generated instead.

    ``deriv``: mr_svm.py's first-derivative option (mr_svm.py:41-44), applied
    to force/temperature traces only.
    ``synthetic_kwargs``: extra args for synthetic.generate_processed (e.g.
    pokes_per_object for small test datasets).
    """
    use_synth = synthetic_seed is not None or not have_processed(
        data_dir, forcetemp_time, contactmic_time
    )
    # MRGAN_REQUIRE_PROCESSED=1 forbids the silent synthetic fallback: a
    # real-data run (e.g. the full-scale rehearsal sweep,
    # tools/rehearse_full_scale.py) must FAIL on missing pickles, not
    # quietly train on synthetic data that then masquerades as real-file
    # evidence (caught in round 5: a partial rehearsal set produced a
    # t5 sweep whose absent-config cells were synthetic without any label).
    if (use_synth and synthetic_seed is None
            and os.environ.get("MRGAN_REQUIRE_PROCESSED") == "1"):
        raise FileNotFoundError(
            f"processed pickles for ({forcetemp_time}, {contactmic_time}) "
            f"not found in {data_dir} and MRGAN_REQUIRE_PROCESSED=1 forbids "
            "the synthetic fallback")
    if use_synth:
        kw = dict(synthetic_kwargs or {})
        # skip the (dominant-cost) 48 kHz audio synthesis for audio-free
        # modalities
        kw.setdefault("with_contact", modalities in feat_ops.NEEDS_AUDIO)
        synth = _generate_processed_memo(
            seed=0 if synthetic_seed is None else synthetic_seed,
            forcetemp_time=forcetemp_time,
            contactmic_time=contactmic_time,
            **kw,
        )

    objects = {}
    xs, ys = [], []
    for m, material in enumerate(MATERIALS):
        if verbose:
            print("Processing", material, flush=True)
        all_data = (
            synth[material]
            if use_synth
            else _load_material(data_dir, material, forcetemp_time, contactmic_time)
        )
        for obj_name, obj_data in all_data.items():
            arrs = _material_batches(obj_data)
            n = len(arrs["temperature"])
            if deriv:
                from ..ops import resample as rs

                t_time = np.asarray(obj_data["temperatureTime"], np.float32)
                f_time = np.asarray(obj_data["forceTime"], np.float32)
                arrs["force0"] = np.asarray(rs.first_deriv(arrs["force0"], f_time))
                arrs["force1"] = np.asarray(rs.first_deriv(arrs["force1"], f_time))
                arrs["temperature"] = np.asarray(
                    rs.first_deriv(arrs["temperature"], t_time)
                )
            logmel = None
            if modalities in feat_ops.NEEDS_AUDIO:
                chunks = []
                contact = arrs["contact"]
                for s in range(0, n, batch_size):
                    chunks.append(
                        np.asarray(
                            mel_ops.frontend_logmel(contact[s : s + batch_size])
                        )
                    )
                logmel = np.concatenate(chunks, 0)
            x = np.asarray(
                feat_ops.assemble(
                    modalities,
                    temperature=arrs.get("temperature"),
                    force0=arrs.get("force0"),
                    force1=arrs.get("force1"),
                    logmel=logmel,
                )
            )
            y = np.full(n, m, np.int32)
            if leave_object_out:
                objects[obj_name] = {"x": x, "y": y}
            else:
                xs.append(x)
                ys.append(y)

    if leave_object_out:
        return objects
    x = np.concatenate(xs, 0)
    y = np.concatenate(ys, 0)
    if verbose:
        print("X:", x.shape, "y:", y.shape, flush=True)
    return x, y
