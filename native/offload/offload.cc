// ccoffload — native edge client for the remote-inference offload protocol.
//
// Mirrors the iOS camera app's offload path (reference Yolo.m:269-302,
// 363-403) as a standalone C++ client: POST a raw res*res*3 RGB frame to
// /yolo, then keep the session sticky via the x-session-id header and send
// SPARSE FRAME DIFFS to /diff — (int32 little-endian pixel index, uint8
// value) records — whenever the changed-byte budget stays within 10% of a
// full frame (the reference's threshold, Yolo.m:373-380). A 409 from /diff
// (server lost the session, server/http.py _post_offload) falls back to a
// full-frame resend, exactly like the phone client.
//
// Usage:
//   ccoffload --server http://host:8080 [--res 640] [--synthetic N]
//             [--raw]            read N frames of res*res*3 bytes from stdin
//             [--diff-first]     try /diff before any /yolo (409 recovery)
//
// Output, one line per frame:  "<i> <full|diff|diff409full> <n_boxes> [row0]"
// Exit 0 when every frame got an inference response.

#include <netdb.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

#include <string>
#include <vector>

struct Url {
  std::string host, port, path;
};

static bool parse_url(const std::string &url, Url *u) {
  size_t p = url.find("://");
  if (p == std::string::npos) return false;
  std::string rest = url.substr(p + 3);
  size_t slash = rest.find('/');
  std::string hostport = rest.substr(0, slash);
  u->path = slash == std::string::npos ? "/" : rest.substr(slash);
  size_t colon = hostport.find(':');
  u->host = hostport.substr(0, colon);
  u->port = colon == std::string::npos ? "80" : hostport.substr(colon + 1);
  return !u->host.empty();
}

// minimal HTTP/1.1 POST (binary body, Connection: close); captures the
// response status, body, and x-session-id header
static bool http_post(const std::string &base, const std::string &path,
                      const uint8_t *body, size_t body_len,
                      const std::string &session_id, int *status,
                      std::vector<uint8_t> *resp_body,
                      std::string *resp_session, std::string *err) {
  Url u;
  if (!parse_url(base, &u)) {
    *err = "bad url: " + base;
    return false;
  }
  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(u.host.c_str(), u.port.c_str(), &hints, &res)) {
    *err = "resolve failed: " + u.host;
    return false;
  }
  int fd = -1;
  for (addrinfo *ai = res; ai; ai = ai->ai_next) {
    fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    timeval tv{30, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd < 0) {
    *err = "connect failed: " + u.host + ":" + u.port;
    return false;
  }
  std::string host_hdr = u.host + (u.port == "80" ? "" : ":" + u.port);
  std::string req = "POST " + path + " HTTP/1.1\r\nHost: " + host_hdr +
                    "\r\nConnection: close\r\nUser-Agent: ccoffload/1\r\n"
                    "Content-Type: application/octet-stream\r\n"
                    "Content-Length: " + std::to_string(body_len) + "\r\n";
  if (!session_id.empty()) req += "x-session-id: " + session_id + "\r\n";
  req += "\r\n";
  bool sent = write(fd, req.data(), req.size()) == (ssize_t)req.size();
  for (size_t off = 0; sent && off < body_len;) {
    ssize_t n = write(fd, body + off, body_len - off);
    if (n <= 0) { sent = false; break; }
    off += (size_t)n;
  }
  if (!sent) {
    close(fd);
    *err = "send failed";
    return false;
  }
  std::vector<uint8_t> raw;
  uint8_t buf[16384];
  ssize_t n;
  while ((n = read(fd, buf, sizeof buf)) > 0) raw.insert(raw.end(), buf, buf + n);
  bool read_err = n < 0;
  close(fd);
  if (read_err) {
    *err = "read failed or timed out";
    return false;
  }
  std::string head(raw.begin(), raw.begin() + std::min<size_t>(raw.size(), 8192));
  size_t hdr_end = head.find("\r\n\r\n");
  if (hdr_end == std::string::npos) {
    *err = "malformed response";
    return false;
  }
  sscanf(head.c_str(), "HTTP/%*s %d", status);
  std::string lower;
  for (size_t i = 0; i < hdr_end; i++) lower += (char)tolower(head[i]);
  size_t sp = lower.find("x-session-id:");
  if (sp != std::string::npos) {
    size_t v = sp + 13;
    while (v < hdr_end && head[v] == ' ') v++;
    size_t e = head.find("\r\n", v);
    *resp_session = head.substr(v, e - v);
  }
  resp_body->assign(raw.begin() + hdr_end + 4, raw.end());
  return true;
}

int main(int argc, char **argv) {
  std::string server;
  int res = 640, synthetic = 0;
  bool raw_stdin = false, diff_first = false;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--server" && i + 1 < argc) server = argv[++i];
    else if (a == "--res" && i + 1 < argc) res = atoi(argv[++i]);
    else if (a == "--synthetic" && i + 1 < argc) synthetic = atoi(argv[++i]);
    else if (a == "--raw") raw_stdin = true;
    else if (a == "--diff-first") diff_first = true;
    else {
      fprintf(stderr, "unknown arg: %s\n", a.c_str());
      return 2;
    }
  }
  if (server.empty() || (!synthetic && !raw_stdin)) {
    fprintf(stderr,
            "usage: ccoffload --server http://host:port "
            "(--synthetic N | --raw) [--res 640] [--diff-first]\n");
    return 2;
  }
  const size_t frame_len = (size_t)res * res * 3;
  const size_t diff_budget = frame_len / 10;  // Yolo.m:373 10%% rule
  std::vector<uint8_t> prev, frame(frame_len);
  std::string session;
  int n_frames = synthetic ? synthetic : 1 << 30;

  for (int fi = 0; fi < n_frames; fi++) {
    if (raw_stdin) {
      size_t off = 0;
      while (off < frame_len) {
        ssize_t n = read(0, frame.data() + off, frame_len - off);
        if (n <= 0) return fi > 0 ? 0 : 1;  // clean EOF between frames
        off += (size_t)n;
      }
    } else {
      // gray background, small white square marching 1 px per frame: the
      // inter-frame delta (2 columns of the square) stays well inside the
      // 10% budget, exercising the sparse path
      memset(frame.data(), 96, frame_len);
      int side = res / 16 < 4 ? 4 : res / 16;
      int x0 = (10 + fi) % (res - side), y0 = res / 4;
      for (int y = y0; y < y0 + side; y++)
        for (int x = x0; x < x0 + side; x++)
          memset(frame.data() + ((size_t)y * res + x) * 3, 255, 3);
    }

    // choose transport: sparse diff when within budget and we have state
    std::vector<uint8_t> patch;
    bool use_diff = diff_first && fi == 0;
    if (!prev.empty()) {
      for (size_t i = 0; i < frame_len && patch.size() <= diff_budget; i++) {
        if (frame[i] != prev[i]) {
          uint32_t idx = (uint32_t)i;
          patch.push_back((uint8_t)(idx & 0xff));
          patch.push_back((uint8_t)((idx >> 8) & 0xff));
          patch.push_back((uint8_t)((idx >> 16) & 0xff));
          patch.push_back((uint8_t)((idx >> 24) & 0xff));
          patch.push_back(frame[i]);
        }
      }
      use_diff = patch.size() <= diff_budget;
    }

    const char *mode = use_diff ? "diff" : "full";
    int status = 0;
    std::vector<uint8_t> body;
    std::string err, new_session = session;
    bool ok = use_diff
        ? http_post(server, "/diff", patch.data(), patch.size(), session,
                    &status, &body, &new_session, &err)
        : http_post(server, "/yolo", frame.data(), frame_len, session,
                    &status, &body, &new_session, &err);
    if (ok && use_diff && status == 409) {
      // session evicted/unknown: resend full, like the phone client
      mode = "diff409full";
      ok = http_post(server, "/yolo", frame.data(), frame_len, new_session,
                     &status, &body, &new_session, &err);
    }
    if (!ok || status != 200) {
      fprintf(stderr, "frame %d: %s (status %d)\n", fi, err.c_str(), status);
      return 1;
    }
    session = new_session;
    prev = frame;

    size_t n_boxes = body.size() / (6 * sizeof(float));
    printf("%d %s %zu", fi, mode, n_boxes);
    if (n_boxes) {
      float row[6];
      memcpy(row, body.data(), sizeof(row));
      printf(" [%.1f %.1f %.1f %.1f %.2f %.0f]", row[0], row[1], row[2],
             row[3], row[4], row[5]);
    }
    printf("\n");
    fflush(stdout);
  }
  return 0;
}
