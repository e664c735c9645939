"""Offline preprocessing pipeline: raw acquisition pickles -> processed MREO.

TPU-native rebuild of the reference's processdata.py:10-92. Semantics are
pinned to the reference:

- 14 (durationOfContact, contactAccelLength) configs (processdata.py:10);
- force/pressure/temperature windows: [impact-0.1 s, impact+duration], the
  post index clamping to the stream end (processdata.py:56-57,72-73),
  resampled to 100*duration points on a linspace between the window's first
  and last sample times (processdata.py:58-59);
- force taxels 3 and 4 (processdata.py:51-53); temperature Celsius channel
  [:, 1] (processdata.py:77);
- contact mic: impact +/- duration/2 with the reference's off-by-one grid
  start (preContactIndex+1), resampled to 48000*duration points
  (processdata.py:79-83);
- accelerometer streams are read but never stored, exactly like the
  reference (its windowAccel is computed and unused);
- output pickle schema and the 'custom_processed_0.1sbefore_...' writer name
  latch (loaders read the unprefixed 'processed_...' name; processdata.py:91
  vs mr_gan.py:32).

Execution is the difference: instead of ~400k serial scipy interp1d calls,
ragged streams are padded to static shapes and each material's pokes run as
a handful of batched gather+lerp XLA kernels (ops.resample) on device.
"""

import glob
import os
import pickle
import sys
import time

import numpy as np

from .. import MATERIALS
from ..ops import resample

# (durationOfContact, contactAccelLength) pairs, processdata.py:10
CONFIGS = list(
    zip(
        [4, 3, 2, 1, 0.5, 0.2, 0.1, 4, 4, 4, 4, 4, 4, 4],
        [0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 1, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05],
    )
)

TAXEL_1, TAXEL_2 = 3, 4  # processdata.py:51-53


def _object_name(filename):
    return "_".join(os.path.basename(filename).split("_")[1:3])


def _batched_window(times, values, impacts, pre, post, num_out):
    """Host ragged lists -> device window+lerp -> (B, num_out) numpy."""
    t, v, m = resample.make_padded(values, times)
    out, grid = resample.window_resample(
        t.astype(np.float32), v, m, np.asarray(impacts, np.float32),
        pre, post, num_out,
    )
    return np.asarray(out), np.asarray(grid)


def _batched_window_centered(times, values, impacts, half, num_out):
    t, v, m = resample.make_padded(values, times)
    out, grid = resample.window_resample_centered(
        t.astype(np.float32), v, m, np.asarray(impacts, np.float32),
        half, num_out,
    )
    return np.asarray(out), np.asarray(grid)


def process_sequences(raw, duration, contact_len, streams=None,
                      out_dtype=np.float32):
    """Process one raw batch dict (the per-file schema of
    collectdataPoke.py's saves) into the processed per-object schema.

    Returns dict with forceTime/force0/force1/pressureTime/pressure0/
    pressure1/temperatureTime/temperature/contactTime/contact lists.
    ``streams`` limits the work to a subset of {"force", "pressure",
    "temperature", "contact"} (None = all) — online serving only windows
    what its modality reads; the 48 kHz contact resample dominates.

    ``out_dtype``: dtype of the stored arrays. The windowing/lerp math runs
    in float32 on device either way (a documented TPU-native deviation from
    the reference's float64 interp1d, pinned by parity tests); the OFFLINE
    pipeline (run()) writes float64 to mirror the reference's on-disk format
    (processdata.py:58-83 stores interp1d's float64 output uncast), while
    online serving keeps float32.
    """
    if streams is None:
        streams = {"force", "pressure", "temperature", "contact"}
    n_ft = int(100 * duration)
    n_c = int(48000 * contact_len)
    impacts = [float(t) for t in raw["collisionTime"]]

    out = {}
    if streams & {"force", "pressure"}:
        force_t = [np.asarray(t, np.float64) for t in raw["RGripRFingerTime"]]
    if "force" in streams:
        force = [np.asarray(f, np.float32) for f in raw["RGripRFingerForce"]]
        f0, f_grid = _batched_window(
            force_t, [f[:, TAXEL_1] for f in force], impacts, 0.1, duration,
            n_ft)
        f1, _ = _batched_window(
            force_t, [f[:, TAXEL_2] for f in force], impacts, 0.1, duration,
            n_ft)
        out["forceTime"] = list(np.asarray(f_grid, out_dtype))
        out["force0"] = list(np.asarray(f0, out_dtype))
        out["force1"] = list(np.asarray(f1, out_dtype))
    if "pressure" in streams:
        pressure = [np.asarray(p, np.float32)
                    for p in raw["RGripRFingerPressure"]]
        p0, p_grid = _batched_window(
            force_t, [p[:, TAXEL_1] for p in pressure], impacts, 0.1,
            duration, n_ft)
        p1, _ = _batched_window(
            force_t, [p[:, TAXEL_2] for p in pressure], impacts, 0.1,
            duration, n_ft)
        out["pressureTime"] = list(np.asarray(p_grid, out_dtype))
        out["pressure0"] = list(np.asarray(p0, out_dtype))
        out["pressure1"] = list(np.asarray(p1, out_dtype))
    if "temperature" in streams:
        temp_t = [np.asarray(t, np.float64) for t in raw["temperatureTime"]]
        temp = [np.asarray(x, np.float32) for x in raw["temperatureRaw"]]
        tc, t_grid = _batched_window(
            temp_t, [x[:, 1] for x in temp], impacts, 0.1, duration, n_ft)
        out["temperatureTime"] = list(np.asarray(t_grid, out_dtype))
        out["temperature"] = list(np.asarray(tc, out_dtype))
    if "contact" in streams:
        con_t = [np.asarray(t, np.float64) for t in raw["contactmicTime"]]
        con = [np.asarray(c, np.float32) for c in raw["contactmic"]]
        cm, c_grid = _batched_window_centered(con_t, con, impacts,
                                              contact_len / 2.0, n_c)
        out["contactTime"] = list(np.asarray(c_grid, out_dtype))
        out["contact"] = list(np.asarray(cm, out_dtype))
    return out


def process_material(material, duration, contact_len, raw_dir="data_raw",
                     verbose=True, out_dtype=np.float32):
    """All raw files of one material -> {object: processed streams}."""
    filenames = sorted(glob.glob(os.path.join(raw_dir,
                                              "newdata_%s*.pkl" % material)))
    all_data = {}
    for filename in filenames:
        obj = _object_name(filename)
        with open(filename, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
        if verbose:
            print("Processing:", filename)
            tt = time.time()
        processed = process_sequences(raw, duration, contact_len,
                                      out_dtype=out_dtype)
        dest = all_data.setdefault(obj, {k: [] for k in processed})
        for k, v in processed.items():
            dest[k].extend(v)
        if verbose:
            print("Done processing file", time.time() - tt, "s")
            sys.stdout.flush()
    return all_data


def run(raw_dir="data_raw", out_dir="data_processed", configs=None,
        prefix="custom_", verbose=True, out_dtype=np.float64):
    """Full pipeline over all configs x materials (processdata.py module loop).

    ``prefix``: the reference writes 'custom_processed_...' while its loaders
    read 'processed_...' (a safety latch so a rerun can't clobber the
    distributed dataset); pass prefix='' to write loader-visible files.
    """
    os.makedirs(out_dir, exist_ok=True)
    for duration, contact_len in (configs or CONFIGS):
        if verbose:
            print("-" * 50)
            print("Force/temperature duration:", duration,
                  "| Contact mic/accel duration:", contact_len)
            print("-" * 50)
        for material in MATERIALS:
            all_data = process_material(material, duration, contact_len,
                                        raw_dir, verbose,
                                        out_dtype=out_dtype)
            out_path = os.path.join(
                out_dir,
                "%sprocessed_0.1sbefore_%s_times_%.2f_%.2f.pkl"
                % (prefix, material, duration, contact_len),
            )
            with open(out_path, "wb") as f:
                pickle.dump(all_data, f, pickle.HIGHEST_PROTOCOL)
