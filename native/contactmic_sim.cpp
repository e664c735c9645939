// Contact-microphone firmware simulator.
//
// C++ stand-in for datacollection/publishers/teensy_contactmic/
// teensy_contactmic.ino -- the free-running 12-bit ADC line streamer
// (one integer per line, ino:12-15) -- plus the physics the hardware
// provided: an idle noise floor around mid-scale and, when the orchestrator
// announces an impact, a damped multi-mode resonant burst.
//
// stdin commands (simulator-only; the real firmware has none):
//   B <freq_hz> <amplitude> <decay_per_s>   trigger an impact burst
//   Q                                       quit
//
// Usage: contactmic_sim [--rate HZ] [--timescale N] [--noise COUNTS]
//   rate: sample/line rate in sim-time Hz (the real Teensy streams as fast
//   as USB-serial allows; 115200 baud ~ a few kHz of decimal lines).

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>

#include "line_io.h"

int main(int argc, char** argv) {
  double rate = 4000.0, timescale = 1.0, noise = 12.0;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--rate") && i + 1 < argc) rate = std::stod(argv[++i]);
    else if (!std::strcmp(argv[i], "--timescale") && i + 1 < argc) timescale = std::stod(argv[++i]);
    else if (!std::strcmp(argv[i], "--noise") && i + 1 < argc) noise = std::stod(argv[++i]);
  }

  LineReader commands;
  std::setvbuf(stdout, nullptr, _IOFBF, 1 << 16);
  std::mt19937 rng(12345);
  std::normal_distribution<double> gauss(0.0, 1.0);

  double burst_freq = 0.0, burst_amp = 0.0, burst_decay = 0.0;
  double burst_t = -1.0;  // seconds since impact; <0 = idle
  const double dt = 1.0 / rate;
  long tick = 0;
  auto wall_start = std::chrono::steady_clock::now();

  while (true) {
    std::string line;
    while (commands.poll(line)) {
      if (line.empty()) continue;
      if (line[0] == 'Q') return 0;
      if (line[0] == 'B') {
        std::sscanf(line.c_str() + 1, "%lf %lf %lf", &burst_freq, &burst_amp,
                    &burst_decay);
        burst_t = 0.0;
      }
    }

    double sample = 2048.0 + noise * gauss(rng);
    if (burst_t >= 0.0) {
      sample += burst_amp *
                (std::exp(-burst_decay * burst_t) *
                     std::sin(2.0 * M_PI * burst_freq * burst_t) +
                 0.4 * std::exp(-1.8 * burst_decay * burst_t) *
                     std::sin(2.0 * M_PI * 2.3 * burst_freq * burst_t));
      burst_t += dt;
      if (burst_amp * std::exp(-burst_decay * burst_t) < 0.5) burst_t = -1.0;
    }
    int v = static_cast<int>(sample);
    if (v < 0) v = 0;
    if (v > 4095) v = 4095;
    std::printf("%d\n", v);
    ++tick;

    if (tick % 64 == 0) {
      std::fflush(stdout);
      auto target = wall_start + std::chrono::duration_cast<
          std::chrono::steady_clock::duration>(
          std::chrono::duration<double>(tick * dt / timescale));
      if (target > std::chrono::steady_clock::now())
        std::this_thread::sleep_until(target);
    }
  }
}
