"""Simulated PR2 arm controller + fingertip sensor streams + contact physics.

Replaces two reference components:

- datacollection/control/controller.py (C13): the Controller API used by the
  orchestrator — moveGripperTo / grip / rotateGripperWrist / lookAt /
  initJoints / getGripperPosition — reimplemented over a kinematic point
  model (linear interpolation to the goal over the commanded timeout,
  matching the joint-trajectory actionlib semantics the orchestrator relies
  on: non-blocking, queryable position);
- the physical world the PR2 provided: fingertip force/pressure raw taxel
  streams (/pressure/r_gripper_motor) and gripper accelerometer
  (/accelerometer/r_gripper_motor) topics, plus the thermal/acoustic contact
  coupling, driven into the C++ firmware sims via their X/R and B commands.

Material presets set the contact physics (thermal coupling, stiffness,
resonance) so different 'objects' produce distinguishable signals end-to-end.
"""

import threading

import numpy as np

from .bus import BusClient

# (thermal coupling mK/s, stiffness N/mm-ish, resonance Hz, burst amp, decay)
MATERIALS = {
    "plastic": (120, 0.5, 900.0, 400.0, 60.0),
    "glass": (260, 0.9, 2400.0, 900.0, 25.0),
    "fabric": (40, 0.15, 300.0, 100.0, 150.0),
    "metal": (420, 1.0, 3600.0, 1100.0, 15.0),
    "wood": (100, 0.7, 600.0, 500.0, 80.0),
    "ceramic": (280, 0.95, 1800.0, 800.0, 30.0),
}

FORCE_PER_UNIT = 50.0     # raw counts per newton (stands in for PressureInfo)
TACTILE_AREA = 0.0003     # m^2 per taxel (pressure = F / area / 1000 kPa)
N_TAXELS = 22             # PR2 fingertip array size
FORCE_RATE = 50.0         # Hz
ACCEL_RATE = 100.0        # Hz


class SimWorld(threading.Thread):
    """Publishes PR2 sensor streams and couples contact into the firmware
    sims. The gripper's poke axis is y (index 1) for horizontal pokes or z
    (index 2) for vertical, like the reference's endCriteria index."""

    def __init__(self, bus_address, clock, thermal_dev, mic_dev,
                 material="plastic", surface_offset=0.07, axis=1, seed=0):
        super().__init__(daemon=True)
        self.clock = clock
        self.client = BusClient(bus_address)
        self.thermal_dev = thermal_dev
        self.mic_dev = mic_dev
        self.material = material
        self.axis = axis
        self.surface = None  # set on first gripper position report
        self.surface_offset = surface_offset
        self.gripper_pos = np.zeros(3)
        self.in_contact = False
        self.rng = np.random.RandomState(seed)
        self._running = True
        self._lock = threading.Lock()

    def set_start(self, pos):
        """Anchor the object surface relative to the poke start position."""
        with self._lock:
            self.gripper_pos = np.array(pos, float)
            direction = 1.0 if self.axis == 1 else -1.0
            self.surface = pos[self.axis] + direction * self.surface_offset

    def update_gripper(self, pos):
        with self._lock:
            self.gripper_pos = np.array(pos, float)

    def _penetration(self):
        if self.surface is None:
            return 0.0
        if self.axis == 1:
            return max(0.0, self.gripper_pos[1] - self.surface)
        return max(0.0, self.surface - self.gripper_pos[2])

    def run(self):
        coupling, stiffness, freq, amp, decay = MATERIALS[self.material]
        force_period = 1.0 / FORCE_RATE
        accel_period = 1.0 / ACCEL_RATE
        next_force = next_accel = self.clock.now()
        while self._running:
            now = self.clock.now()
            pen = self._penetration()
            contact = pen > 0.0
            if contact and not self.in_contact:
                self.thermal_dev.write(f"X {int(coupling)}")
                jitter = self.rng.uniform(0.95, 1.05)
                self.mic_dev.write(f"B {freq * jitter} {amp} {decay}")
                self.in_contact = True
            elif not contact and self.in_contact:
                self.thermal_dev.write("R")
                self.in_contact = False

            if now >= next_force:
                raw = 1700.0 + 3.0 * self.rng.randn(N_TAXELS)
                force_n = stiffness * pen * 400.0
                raw[3] += force_n * FORCE_PER_UNIT
                raw[4] += 0.8 * force_n * FORCE_PER_UNIT
                self.client.publish("/pressure/r_gripper_motor",
                                    {"r_finger_tip": raw.tolist()})
                next_force += force_period
            if now >= next_accel:
                base = 0.02 * self.rng.randn(3, 3)
                if contact and pen < 0.004:
                    base += self.rng.randn(3, 3) * 2.0  # impact transient
                self.client.publish(
                    "/accelerometer/r_gripper_motor",
                    {"samples": base.tolist()},
                )
                next_accel += accel_period
            self.clock.sleep(min(force_period, accel_period) / 4.0)

    def stop(self):
        self._running = False


class SimController:
    """control/controller.py API over a kinematic point gripper."""

    def __init__(self, frame="torso_lift_link", vertical_movement=False,
                 world=None, clock=None):
        self.frame = frame
        self.vertical = vertical_movement
        self.world = world
        self.clock = clock
        self.right_pos = np.zeros(3)
        self.right_rpy = np.zeros(3)
        self.left_pos = np.zeros(3)
        self.left_rpy = np.zeros(3)
        self.wrist_angle = 0.0
        self._movers = []

    # -- motion ------------------------------------------------------------
    def moveGripperTo(self, position, orientation=None, timeout=4.0,
                      useInitGuess=False, wait=False, rightArm=True):
        """Linear interpolation to the goal over ``timeout`` sim-seconds, on
        a background thread (actionlib-goal semantics: non-blocking unless
        wait=True; controller.py:105-153)."""
        position = np.array(position, float)
        if not rightArm:
            self.left_pos = position
            if orientation is not None:
                self.left_rpy = np.array(orientation, float)
            return

        start = np.copy(self.right_pos)
        t0 = self.clock.now()

        def mover():
            while True:
                frac = (self.clock.now() - t0) / max(timeout, 1e-6)
                f = min(frac, 1.0)
                self.right_pos = start + f * (position - start)
                if self.world is not None:
                    self.world.update_gripper(self.right_pos)
                if f >= 1.0:
                    return
                self.clock.sleep(0.002)

        th = threading.Thread(target=mover, daemon=True)
        th.start()
        self._movers.append(th)
        if orientation is not None:
            self.right_rpy = np.array(orientation, float)
        if wait:
            th.join()

    def getGripperPosition(self, rightArm=True):
        if rightArm:
            return np.copy(self.right_pos), np.copy(self.right_rpy)
        return np.copy(self.left_pos), np.copy(self.left_rpy)

    # -- auxiliary API (logged no-ops on the kinematic model) ---------------
    def grip(self, openGripper=False, maxEffort=20.0, rightArm=True,
             miniOpen=False):
        pass

    def rotateGripperWrist(self, angle):
        self.wrist_angle = (self.wrist_angle + angle) % (2 * np.pi)

    def lookAt(self, position):
        pass

    def initJoints(self):
        pass

    def printJointStates(self):
        pass
