// Non-blocking line-oriented stdin reader shared by the firmware simulators.
// Models Teensy serialEvent(): commands arrive asynchronously while the
// control loops keep running.
#pragma once

#include <fcntl.h>
#include <unistd.h>

#include <string>

class LineReader {
 public:
  LineReader() {
    int flags = fcntl(STDIN_FILENO, F_GETFL, 0);
    fcntl(STDIN_FILENO, F_SETFL, flags | O_NONBLOCK);
  }

  // Returns true and fills `line` (without newline) if a full line is ready.
  bool poll(std::string& line) {
    char buf[256];
    ssize_t n;
    while ((n = read(STDIN_FILENO, buf, sizeof(buf))) > 0)
      pending_.append(buf, static_cast<size_t>(n));
    auto pos = pending_.find('\n');
    if (pos == std::string::npos) return false;
    line = pending_.substr(0, pos);
    pending_.erase(0, pos + 1);
    return true;
  }

 private:
  std::string pending_;
};
