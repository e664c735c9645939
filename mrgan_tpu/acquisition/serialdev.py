"""Pipe-backed 'serial port' onto the C++ firmware simulators.

Mirrors the reference's pyserial usage: setupSerial with timeouts + flush
(temperaturepublisher.py:14-22), getData with 4 retry attempts and format
validation (:24-40), single-character command writes (:47-51).
"""

import os
import queue
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
NATIVE_BIN = os.path.join(_NATIVE_DIR, "bin")


def sim_path(name):
    """Locate (or build) a firmware-simulator binary.

    Resolution order: $MRGAN_NATIVE_BIN override -> checkout native/bin ->
    on-demand g++ build from the checkout sources (so `pip install -e .`
    works without a prior `make -C native`). A non-editable install ships
    no C++ sources; the error says to run from a source checkout.
    """
    env_bin = os.environ.get("MRGAN_NATIVE_BIN")
    if env_bin:
        path = os.path.join(env_bin, name)
        if os.path.exists(path):
            return path
        # fall through: a stale/typoed override should still get the
        # checkout build (or the actionable error), not a bare Popen failure
    path = os.path.join(NATIVE_BIN, name)
    if os.path.exists(path):
        return path
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    if os.path.exists(src):
        os.makedirs(NATIVE_BIN, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", path, src, "-pthread"],
            check=True, cwd=_NATIVE_DIR)
        return path
    raise FileNotFoundError(
        f"firmware simulator {name!r} not found: build it with "
        "`make -C native` from a source checkout, or point "
        "$MRGAN_NATIVE_BIN at a directory containing the built simulators "
        "(the binaries are not shipped in wheels)")


class SerialDevice:
    """Line-oriented device over a subprocess's stdio."""

    def __init__(self, argv, timeout=0.05):
        self.proc = subprocess.Popen(
            argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )
        self.timeout = timeout
        self._lines = queue.Queue(maxsize=1_000_000)
        self._reader = threading.Thread(target=self._pump, daemon=True)
        self._reader.start()

    def _pump(self):
        try:
            for line in self.proc.stdout:
                self._lines.put(line)
        except ValueError:
            pass

    def readline(self):
        try:
            return self._lines.get(timeout=self.timeout)
        except queue.Empty:
            return ""

    def write(self, data):
        try:
            self.proc.stdin.write(data if data.endswith("\n") else data + "\n")
            self.proc.stdin.flush()
        except (OSError, ValueError):
            pass

    def flush(self):
        pass  # queue drains continuously; parity with serialDev.flush()

    def drain(self):
        """Discard everything buffered so far (used on state transitions so a
        recording starts from fresh samples, not stale queue backlog). O(1):
        popping a multi-second backlog item-by-item would delay the recording
        epoch by tens of sim-milliseconds."""
        with self._lines.mutex:
            self._lines.queue.clear()

    def close(self):
        self.write("Q")
        try:
            self.proc.wait(timeout=2)
        except subprocess.TimeoutExpired:
            self.proc.kill()


def setup_serial(argv, timeout=0.05, warmup_lines=25):
    """setupSerial + the reference's 'read a few lines to get things rolling'
    (temperaturepublisher.py:66-67)."""
    dev = SerialDevice(argv, timeout)
    for _ in range(warmup_lines):
        dev.readline()
    return dev


def get_data(dev, num_outputs=1, max_value=None):
    """getData retry semantics (temperaturepublisher.py:24-40,
    contactmicpublisher.py:24-34). Returns list (num_outputs>1), float, or []."""
    for _ in range(4):
        line = dev.readline()
        try:
            values = [float(v) for v in line.split(",")]
            if num_outputs > 1:
                if len(values) == num_outputs:
                    return values
            elif len(values) == 1:
                if max_value is None or values[0] < max_value:
                    return values[0]
        except ValueError:
            pass
        dev.flush()
    return []


def thermal_sim_argv(timescale=1.0, ambient=22.0, material=None):
    argv = [sim_path("thermal_sim"),
            "--timescale", str(timescale), "--ambient", str(ambient)]
    if material is not None:
        argv += ["--material", str(material)]
    return argv


def contactmic_sim_argv(timescale=1.0, rate=4000.0, noise=12.0):
    return [sim_path("contactmic_sim"),
            "--timescale", str(timescale), "--rate", str(rate),
            "--noise", str(noise)]
