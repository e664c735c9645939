// Thermal-control firmware simulator.
//
// C++ stand-in for the Teensy sketch
// datacollection/publishers/active_thermal_magnum_opus/active_thermal_magnum_opus.ino
// so the acquisition stack runs end-to-end without hardware. It reproduces the
// firmware's observable behavior -- not its source:
//
//   * 1 kHz buck-converter PI(D) voltage loop with a 10-sample moving average
//     of the supply millivolt reading (ino:96-111);
//   * 10 Hz temperature PID holding Tset = 55 C with the same anti-windup
//     clamps (ino:78-94): Te_sum clamped to [minV*1000, maxV*1000 - kp*Te],
//     setpoint clamped to [7000, 13000] mv;
//   * 100 Hz serial telemetry "raw,celsius\n" (ino:113-121);
//   * Steinhart-Hart-style thermistor conversion with the firmware's
//     constants (ino:61-71), inverted here to synthesize the 12-bit ADC raw
//     value from the simulated temperature;
//   * serial command protocol on stdin (ino:152-181):
//       C          control on
//       H          hold (control off)
//       V<mv>      voltage setpoint (>1000, clamped 1000..14000, control off)
//       T<mC>      temperature setpoint in millicelsius (>25000, clamped, on)
//       K<ki>      temperature integral gain (1..400)
//
// Simulator-only extensions (the physics the real world provided):
//       X<mWperK>  contact begins: thermal coupling to the poked material
//       R          release contact
//       Q          quit
//
// Plant model: first-order heater/fingertip thermal mass driven by the buck
// voltage, losing heat to ambient and -- during contact -- to the material.
//
// Usage: thermal_sim [--timescale N] [--ambient C] [--material C]
//   timescale N runs the simulation N x faster than wall-clock (telemetry
//   rates scale with it; timestamps in the consumer are sim-time).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>

#include "line_io.h"

namespace {

constexpr float kMinV = 7.0f, kMaxV = 13.0f;
constexpr float kMvCoeff = 4.922f;

// Thermistor constants (ino:61-71)
constexpr float kVref = 3.3f;
constexpr float kT1 = 288.15f;
constexpr float kBeta = 3406.0f;
constexpr float kR1 = 14827.0f;

float clampf(float v, float lo, float hi) { return std::min(std::max(v, lo), hi); }

// ino temperature(): ADC raw + supply volts -> Celsius.
float adc_to_celsius(int a, float vsupp, float rref) {
  float vin = clampf(static_cast<float>(a) / 4095.0f * kVref, 0.001f, 3.3f);
  float rt = clampf(rref * (vsupp / vin - 1.0f), 1000.0f, 20000.0f);
  float bl = kBeta / std::log(kR1 / rt);
  return (kT1 * bl) / (bl - kT1) - 273.15f;
}

// Inverse of adc_to_celsius: simulated Celsius -> 12-bit raw, so consumers
// decoding with the firmware's formula recover the simulated temperature.
int celsius_to_adc(float tc, float vsupp, float rref) {
  float tk = tc + 273.15f;
  // bl = Beta/log(R1/RT);  tc_k = T1*bl/(bl - T1)  =>  bl = tk*T1/(tk - T1)... solve:
  // tk = T1*bl/(bl-T1) -> bl = tk*T1/(tk-T1)? check: bl*(tk - T1) = tk*T1 -> yes
  float bl = tk * kT1 / (tk - kT1);
  float rt = clampf(kR1 / std::exp(kBeta / bl), 1000.0f, 20000.0f);
  float vin = clampf(vsupp * rref / (rt + rref), 0.001f, 3.3f);
  return static_cast<int>(clampf(vin / kVref * 4095.0f, 0.0f, 4095.0f));
}

struct Firmware {
  // Temperature PID state (ino:78-94)
  volatile bool control = true;
  float tset = 55.0f;
  float temperature_kp = 1500.0f, temperature_ki = 300.0f, temperature_kd = 30.0f;
  float te_last = 0.0f, te_sum = kMinV * 1000.0f;
  float setpoint_mv = 10000.0f;

  // Buck PI state (ino:96-111)
  float kp = 0.5f, ki = 1.0f, kd = 0.0f;
  float input_mv[10] = {0};
  float input_mv_avg = 0.0f;
  float delta_sum = 1000.0f, delta_last = 0.0f;
  float i_max = 1500.0f;
  float pwm = 0.0f;

  void buck_step(float supply_mv_reading) {
    std::memmove(input_mv, input_mv + 1, sizeof(float) * 9);
    input_mv[9] = supply_mv_reading;
    input_mv_avg = 0.0f;
    for (float v : input_mv) input_mv_avg += v / 10.0f;
    float delta = setpoint_mv - input_mv_avg;
    delta_sum = clampf(delta_sum + delta * 0.001f * ki, -i_max, i_max);
    pwm = clampf(delta * kp + delta_sum + (delta - delta_last) * kd, 0.0f, 4095.0f);
    delta_last = delta;
  }

  void temperature_step(float actual_c) {
    if (actual_c > 20.0f && control) {
      float te = tset - actual_c;
      te_sum = clampf(te_sum + te * temperature_ki * 0.1f, kMinV * 1000.0f,
                      kMaxV * 1000.0f - temperature_kp * te);
      setpoint_mv = clampf(temperature_kp * te + te_sum +
                               temperature_kd * (te - te_last) / 0.1f,
                           kMinV * 1000.0f, kMaxV * 1000.0f);
      te_last = te;
    }
  }
};

struct Plant {
  // Fingertip thermal mass heated by the buck output, cooling to ambient
  // and, during contact, into the material.
  float ambient_c = 22.0f;
  float material_c = 22.0f;
  float temp_c = 22.0f;
  float heat_gain = 1.3f;         // C/s per (V^2 * 0.02) unit of drive power
  float loss_ambient = 0.08f;     // 1/s
  float contact_coupling = 0.0f;  // 1/s, set by the X command
  float supply_v = 0.0f;

  void step(float pwm, float dt) {
    // Buck output follows the PWM duty against the ~19.96 V input rail
    // (the firmware's Inmv constant), with a fast electrical time constant.
    float target_v = pwm / 4095.0f * 19.96f;
    supply_v += (target_v - supply_v) * std::min(1.0f, dt / 0.005f);
    float power = supply_v * supply_v * 0.02f;
    temp_c += dt * (heat_gain * power - loss_ambient * (temp_c - ambient_c) -
                    contact_coupling * (temp_c - material_c));
  }
};

}  // namespace

int main(int argc, char** argv) {
  float timescale = 1.0f;
  Plant plant;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--timescale") && i + 1 < argc)
      timescale = std::stof(argv[++i]);
    else if (!std::strcmp(argv[i], "--ambient") && i + 1 < argc)
      plant.ambient_c = plant.temp_c = plant.material_c = std::stof(argv[++i]);
    else if (!std::strcmp(argv[i], "--material") && i + 1 < argc)
      plant.material_c = std::stof(argv[++i]);
  }

  Firmware fw;
  LineReader commands;  // non-blocking stdin
  std::setvbuf(stdout, nullptr, _IOLBF, 1 << 16);

  const double dt = 0.001;  // 1 kHz base tick (the buck loop rate)
  long tick = 0;
  auto wall_start = std::chrono::steady_clock::now();

  while (true) {
    // --- serial command handling (ino:152-181 + sim extensions) ---
    std::string line;
    while (commands.poll(line)) {
      if (line.empty()) continue;
      char c = line[0];
      const char* arg = line.c_str() + 1;
      if (c == 'C') fw.control = true;
      else if (c == 'H') fw.control = false;
      else if (c == 'V') {
        int v = std::atoi(arg);
        if (v > 1000) { fw.setpoint_mv = clampf(v, 1000, 14000); fw.control = false; }
      } else if (c == 'T') {
        int v = std::atoi(arg);
        if (v > 25000) { fw.tset = clampf(v * 0.001f, 0.0f, 55.0f); fw.control = true; }
      } else if (c == 'K') {
        int v = std::atoi(arg);
        if (v >= 1) fw.temperature_ki = clampf(v, 1, 400);
      } else if (c == 'X') {
        plant.contact_coupling = std::atoi(arg) * 0.001f;
      } else if (c == 'R') {
        plant.contact_coupling = 0.0f;
      } else if (c == 'Q') {
        return 0;
      }
    }

    // --- multi-rate loops on the 1 kHz base tick ---
    float supply_mv = plant.supply_v * 1000.0f;
    // ADC reading of the supply via the mv coefficient path (ino:101)
    float reading = std::round(supply_mv / kMvCoeff) * kMvCoeff;
    fw.buck_step(reading);
    plant.step(fw.pwm, static_cast<float>(dt));

    if (tick % 100 == 0) {  // 10 Hz temperature PID (ino:86)
      int raw = celsius_to_adc(plant.temp_c, fw.input_mv_avg * 0.001f, 1000.0f);
      fw.temperature_step(adc_to_celsius(raw, fw.input_mv_avg * 0.001f, 1000.0f));
    }
    if (tick % 10 == 0) {  // 100 Hz telemetry (ino:113-121)
      int raw = celsius_to_adc(plant.temp_c, fw.input_mv_avg * 0.001f, 1000.0f);
      std::printf("%d,%.2f\n", raw,
                  adc_to_celsius(raw, fw.input_mv_avg * 0.001f, 1000.0f));
    }
    ++tick;

    // pace against the (scaled) wall clock, catching up in bursts
    auto target = wall_start + std::chrono::duration_cast<
        std::chrono::steady_clock::duration>(
        std::chrono::duration<double>(tick * dt / timescale));
    if (target > std::chrono::steady_clock::now())
      std::this_thread::sleep_until(target);
  }
}
