"""Synthetic MREO dataset generator.

The reference's experiments read the (not distributed here) 1 GB processed
MREO pickles (mr_gan.py:32). To let every table protocol, test, and benchmark
run hermetically, this module synthesizes a physically-flavored stand-in with
the same schema and shapes:

- 6 materials x 12 objects x ``pokes_per_object`` pokes (defaults to the real
  6 x 12 x 100 = 7200 layout, mr_gan.py:254 comment).
- temperature: heated-fingertip contact cooling curves; drop magnitude and
  time constant follow material thermal effusivity (metal >> glass/ceramic >>
  plastic/wood >> fabric), the physical signal the paper exploits.
- force0/force1: stiffness-dependent loading ramp with damped contact
  oscillation on two taxels.
- contact mic: impact burst of material-dependent damped resonant modes over
  a noise floor, at 48 kHz.

Per-object variation (random factors per object) makes leave-one-object-out
generalization non-trivial, mirroring the real dataset's structure. The
output dict matches the processed-pickle schema, so data.mreo's loaders and
the table CLIs consume synthetic and real data through one code path.
"""

import numpy as np

from .. import MATERIALS

# Raw-stream sample rates (Hz): PR2 fingertip force/pressure, Teensy thermal
# telemetry (active_thermal_magnum_opus.ino:113-121 emits at 100 Hz), contact
# mic ADC stream (teensy_contactmic.ino free-running, ~48 kHz class).
RAW_RATES = {"force": 1000.0, "temperature": 100.0, "contact": 48000.0}

# (temp_drop degC, tau s, stiffness, resonance Hz, audio decay /s, ring amp)
_MATERIAL_PHYSICS = {
    "plastic": (4.0, 1.2, 0.5, 900.0, 60.0, 0.35),
    "glass": (8.0, 0.8, 0.9, 2400.0, 25.0, 0.8),
    "fabric": (1.0, 2.5, 0.1, 300.0, 150.0, 0.08),
    "metal": (14.0, 0.4, 1.0, 3600.0, 15.0, 1.0),
    "wood": (3.0, 1.5, 0.7, 600.0, 80.0, 0.45),
    "ceramic": (9.0, 0.7, 0.95, 1800.0, 30.0, 0.7),
}

SR = 48000


def _object_names(material, n_objects):
    return [f"{material}_obj{k}" for k in range(n_objects)]


def generate_raw_file(seed=0, material="plastic", pokes=4, record_s=5.5,
                      impact_s=0.8, jitter=True):
    """Synthesize one raw acquisition pickle with the collectdataPoke.py save
    schema consumed by processdata.py:41 — per-poke parallel lists:
    temperatureRaw (T,2), temperatureTime, RGripRFingerForce (T,5 taxels),
    RGripRFingerPressure, RGripRFingerTime, contactmic (T,), contactmicTime,
    accelerometer, accelerometerTime, collisionTime (scalar).

    Streams are irregularly sampled (timestamp jitter) so the lerp resampler
    is exercised on realistic input.
    """
    rng = np.random.RandomState(seed)
    drop, tau, stiff, f_res, decay, amp = _MATERIAL_PHYSICS[material]
    out = {k: [] for k in (
        "temperatureRaw", "temperatureTime", "RGripRFingerForce",
        "RGripRFingerPressure", "RGripRFingerTime", "contactmic",
        "contactmicTime", "accelerometer", "accelerometerTime",
        "collisionTime",
    )}

    def times(rate):
        n = int(record_s * rate)
        t = np.arange(n) / rate
        if jitter:
            t = t + rng.uniform(0, 0.2 / rate, n)
        return np.sort(t)

    for _ in range(pokes):
        impact = impact_s + rng.uniform(-0.05, 0.05)

        t_f = times(RAW_RATES["force"])
        contact_t = np.maximum(t_f - impact, 0.0)
        ramp = np.clip(contact_t / 0.05, 0.0, 1.0)
        peak = 3.0 + 4.0 * stiff
        base = peak * ramp + 0.05 * rng.randn(len(t_f))
        force = np.zeros((len(t_f), 5), np.float32)
        force[:, 3] = base
        force[:, 4] = 0.8 * base
        pressure = (force * 20.0 + 5.0).astype(np.float32)

        t_t = times(RAW_RATES["temperature"])
        cool = drop * (1.0 - np.exp(-np.maximum(t_t - impact, 0.0) / tau))
        celsius = 55.0 - cool + 0.05 * rng.randn(len(t_t))
        temp = np.stack(
            [celsius * 37.0 + 500.0, celsius], axis=1
        ).astype(np.float32)  # raw ADC-ish channel 0, Celsius channel 1

        t_c = times(RAW_RATES["contact"])
        tc = t_c - impact
        burst = (
            amp * 200.0 * np.exp(-np.maximum(tc, 0.0) * decay)
            * np.sin(2 * np.pi * f_res * tc) * (tc >= 0.0)
        )
        mic = (burst + 2.0 * rng.randn(len(t_c))).astype(np.float32)

        accel_t = times(3000.0)[: int(3000 * record_s)]
        accel = 0.01 * rng.randn(len(accel_t)).astype(np.float32)

        out["temperatureRaw"].append(temp)
        out["temperatureTime"].append(t_t)
        out["RGripRFingerForce"].append(force)
        out["RGripRFingerPressure"].append(pressure)
        out["RGripRFingerTime"].append(t_f)
        out["contactmic"].append(mic)
        out["contactmicTime"].append(t_c)
        out["accelerometer"].append(accel)
        out["accelerometerTime"].append(accel_t)
        out["collisionTime"].append(impact)
    return out


def generate_processed(seed=0, forcetemp_time=4.0, contactmic_time=0.2,
                       pokes_per_object=100, objects_per_material=12,
                       noise_scale=1.0, with_contact=True):
    """Synthesize the processed-pickle structure:
    {material: {objName: {'temperature','force0','force1','contact',
    'temperatureTime','forceTime','contactTime': (pokes, n) float32}}}.

    ``with_contact=False`` skips the 48 kHz audio synthesis (the dominant
    cost) for force/temperature-only modalities. The same seed produces the
    same force/temperature streams either way (audio uses a separate RNG).
    """
    rng = np.random.RandomState(seed)
    n_ft = int(100 * forcetemp_time)
    n_c = int(SR * contactmic_time)
    t_ft = np.linspace(-0.1, forcetemp_time, n_ft).astype(np.float32)
    t_c = np.linspace(-contactmic_time / 2, contactmic_time / 2, n_c).astype(np.float32)
    out = {}
    for material in MATERIALS:
        drop, tau, stiff, f_res, decay, amp = _MATERIAL_PHYSICS[material]
        objects = {}
        for obj in _object_names(material, objects_per_material):
            p = pokes_per_object
            # per-object factors: the repeatable identity of this object
            o_drop = drop * rng.uniform(0.75, 1.25)
            o_tau = tau * rng.uniform(0.8, 1.2)
            o_stiff = stiff * rng.uniform(0.8, 1.2)
            o_res = f_res * rng.uniform(0.85, 1.15)

            # --- temperature: 55C hold, contact cooling after t=0 ---
            contact_t = np.maximum(t_ft, 0.0)[None, :]
            poke_drop = o_drop * rng.uniform(0.9, 1.1, (p, 1))
            temp = 55.0 - poke_drop * (1.0 - np.exp(-contact_t / o_tau))
            temp += noise_scale * 0.05 * rng.randn(p, n_ft)

            # --- force: ramp at impact, stiffness-damped oscillation ---
            peak = 3.0 + 4.0 * o_stiff * rng.uniform(0.85, 1.15, (p, 1))
            ramp = np.clip(contact_t / 0.05, 0.0, 1.0)
            osc = (
                0.5
                * o_stiff
                * np.exp(-contact_t / 0.15)
                * np.sin(2 * np.pi * (8 + 10 * o_stiff) * contact_t)
            )
            force0 = peak * ramp + peak * osc + noise_scale * 0.05 * rng.randn(p, n_ft)
            force1 = 0.8 * peak * ramp + peak * osc * 0.7 + noise_scale * 0.05 * rng.randn(p, n_ft)

            # --- contact mic: damped resonant burst at window center ---
            # separate RNG (seeded from the main stream) so skipping audio
            # doesn't perturb the force/temperature draws
            audio_seed = rng.randint(2**31 - 1)
            objects[obj] = {
                "temperature": temp.astype(np.float32),
                "force0": force0.astype(np.float32),
                "force1": force1.astype(np.float32),
                "temperatureTime": np.broadcast_to(t_ft, (p, n_ft)).copy(),
                "forceTime": np.broadcast_to(t_ft, (p, n_ft)).copy(),
            }
            if with_contact:
                arng = np.random.RandomState(audio_seed)
                tc = t_c[None, :]
                burst = np.zeros((p, n_c), np.float32)
                for mode, (fm, am) in enumerate(
                    [(o_res, amp), (o_res * 2.3, amp * 0.4),
                     (o_res * 0.5, amp * 0.6)]
                ):
                    phase = arng.uniform(0, 2 * np.pi, (p, 1))
                    fm_p = fm * arng.uniform(0.97, 1.03, (p, 1))
                    burst += (
                        am
                        * 200.0
                        * np.exp(-np.maximum(tc, 0.0) * decay * (1 + mode))
                        * np.sin(2 * np.pi * fm_p * tc + phase)
                        * (tc >= 0.0)
                    ).astype(np.float32)
                contact = burst + noise_scale * 2.0 * arng.randn(p, n_c)
                objects[obj]["contact"] = contact.astype(np.float32)
                objects[obj]["contactTime"] = np.broadcast_to(
                    t_c, (p, n_c)).copy()
        out[material] = objects
    return out
