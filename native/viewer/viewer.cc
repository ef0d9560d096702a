// ccviewer — native edge viewer client for the clearcam relay protocol.
//
// C++ equivalent of the mobile viewer apps (the protocol SURVEY.md §2.2 /
// VERDICT r2 item 2 ask for natively):
//   reference android/.../VideoHelper.kt:187-311 — live stream link fetch,
//     `.aes` download, AES-256-CBC decrypt with the 0x4D41474943 magic
//     check, events cursor (newest_creation_time);
//   reference ios/clearcam/DeviceStreamViewController.m:47-215 — poll
//     get_stream_download_link / delete_stream_download_link.
//
// Plain-HTTP client over POSIX sockets: in production the relay sits behind
// TLS, which this binary reaches through a local terminator (stunnel/envoy)
// — the sandbox has no CA bundle to validate against, and the protocol
// itself is transport-agnostic. The AES core is the same AES-NI unit the
// server uses (native/aes/aesni.c, compiled in).
//
// Commands (all print JSON or write files; exit 0 on success):
//   ccviewer selftest
//   ccviewer decrypt  --in clip.aes --key KEY --out clip.mp4
//   ccviewer devices  --base URL --token T
//   ccviewer events   --base URL --token T [--newest N]
//   ccviewer fetch-event --url U --key KEY --out clip.mp4
//   ccviewer live     --base URL --token T --name CAM --key KEY --out seg.mp4
//   ccviewer release  --base URL --token T --name CAM
//   ccviewer toggle-alerts --base URL --token T --name CAM --on 0|1

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <vector>

extern "C" int cc_aes_cbc(const uint8_t *key32, const uint8_t *iv16,
                          const uint8_t *in, size_t len, uint8_t *out,
                          int encrypt);
extern "C" int cc_aes_selftest(void);

static const uint64_t kMagic = 0x4D41474943ULL;  // helpers.py:310-355

// ---------------------------------------------------------------------------
// wire-format decrypt: IV(16) || CBC(pack('<Q', MAGIC) || payload, PKCS7)
// ---------------------------------------------------------------------------

static bool decrypt_blob(const std::vector<uint8_t> &blob,
                         const std::string &key,
                         std::vector<uint8_t> *out, std::string *err) {
  if (blob.size() < 32 || (blob.size() - 16) % 16) {
    *err = "blob too short or not block-aligned";
    return false;
  }
  uint8_t key32[32] = {0};  // utf-8 truncated / zero-padded (helpers.py:315)
  memcpy(key32, key.data(), key.size() > 32 ? 32 : key.size());
  std::vector<uint8_t> plain(blob.size() - 16);
  if (cc_aes_cbc(key32, blob.data(), blob.data() + 16, plain.size(),
                 plain.data(), 0)) {
    *err = "cbc failed";
    return false;
  }
  uint8_t pad = plain.back();
  if (pad < 1 || pad > 16 || pad > plain.size()) {
    *err = "bad PKCS7 padding";
    return false;
  }
  for (size_t i = plain.size() - pad; i < plain.size(); i++)
    if (plain[i] != pad) {
      *err = "bad PKCS7 padding";
      return false;
    }
  plain.resize(plain.size() - pad);
  if (plain.size() < 8) {
    *err = "missing header";
    return false;
  }
  uint64_t magic = 0;  // little-endian pack('<Q', ...)
  for (int i = 7; i >= 0; i--) magic = (magic << 8) | plain[i];
  if (magic != kMagic) {  // VideoHelper.kt:311 decryptAesFileToMp4 check
    *err = "magic check failed: wrong key or corrupt file";
    return false;
  }
  out->assign(plain.begin() + 8, plain.end());
  return true;
}

// ---------------------------------------------------------------------------
// minimal HTTP/1.1 GET over POSIX sockets
// ---------------------------------------------------------------------------

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

static bool http_get(const std::string &url, std::vector<uint8_t> *body,
                     std::string *err, int *status = nullptr) {
  Url u;
  if (!parse_url(url, &u)) {
    *err = "bad url: " + url;
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
    timeval tv{15, 0};
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
  std::string req = "GET " + u.path + " HTTP/1.1\r\nHost: " + host_hdr +
                    "\r\nConnection: close\r\nUser-Agent: ccviewer/1\r\n\r\n";
  if (write(fd, req.data(), req.size()) != (ssize_t)req.size()) {
    close(fd);
    *err = "send failed";
    return false;
  }
  std::vector<uint8_t> raw;
  uint8_t buf[16384];
  ssize_t n;
  while ((n = read(fd, buf, sizeof buf)) > 0) raw.insert(raw.end(), buf, buf + n);
  bool read_err = n < 0;  // SO_RCVTIMEO or connection error — NOT a clean EOF
  close(fd);
  if (read_err) {
    *err = "read failed or timed out";
    return false;
  }
  std::string head(raw.begin(),
                   raw.begin() + std::min<size_t>(raw.size(), 8192));
  size_t hdr_end = head.find("\r\n\r\n");
  if (hdr_end == std::string::npos) {
    *err = "malformed response";
    return false;
  }
  int code = 0;
  sscanf(head.c_str(), "HTTP/%*s %d", &code);
  if (status) *status = code;
  body->assign(raw.begin() + hdr_end + 4, raw.end());
  // de-chunk if transfer-encoding: chunked (python http.server may use it)
  std::string lower;
  for (char c : head.substr(0, hdr_end)) lower += (char)tolower(c);
  if (lower.find("transfer-encoding: chunked") != std::string::npos) {
    std::vector<uint8_t> out;
    size_t i = 0;
    while (i < body->size()) {
      size_t eol = i;
      while (eol + 1 < body->size() &&
             !((*body)[eol] == '\r' && (*body)[eol + 1] == '\n'))
        eol++;
      size_t len = strtoul(
          std::string(body->begin() + i, body->begin() + eol).c_str(),
          nullptr, 16);
      if (!len) break;
      i = eol + 2;
      if (len > body->size() - i) {  // truncated chunk: declared length
        *err = "truncated chunked body";  // exceeds received bytes
        return false;
      }
      out.insert(out.end(), body->begin() + i, body->begin() + i + len);
      i += len + 2;
    }
    *body = out;
  } else {
    // verify Content-Length when present — a mid-body disconnect must not
    // be reported as a complete response
    size_t clp = lower.find("content-length:");
    if (clp != std::string::npos) {
      size_t want = strtoul(lower.c_str() + clp + 15, nullptr, 10);
      if (body->size() < want) {
        *err = "truncated body (content-length mismatch)";
        return false;
      }
      body->resize(want);
    }
  }
  if (code < 200 || code >= 300) {
    *err = "http status " + std::to_string(code);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// tiny JSON string-field extractor — relay responses are flat objects/lists
// of objects ({"download_link": "..."}, [{"url": "...", ...}, ...])
// ---------------------------------------------------------------------------

static std::string json_field(const std::string &json, const std::string &key) {
  std::string needle = "\"" + key + "\"";
  size_t p = json.find(needle);
  if (p == std::string::npos) return "";
  p = json.find(':', p + needle.size());
  if (p == std::string::npos) return "";
  p++;
  while (p < json.size() && isspace((unsigned char)json[p])) p++;
  if (p >= json.size() || json[p] != '"') return "";
  std::string out;
  for (p++; p < json.size() && json[p] != '"'; p++) {
    if (json[p] == '\\' && p + 1 < json.size()) p++;
    out += json[p];
  }
  return out;
}

static std::string url_encode(const std::string &s) {
  std::string out;
  char hex[8];
  for (unsigned char c : s) {
    if (isalnum(c) || c == '-' || c == '_' || c == '.' || c == '~') {
      out += (char)c;
    } else {
      snprintf(hex, sizeof hex, "%%%02X", c);
      out += hex;
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// commands
// ---------------------------------------------------------------------------

static bool write_file(const std::string &path, const std::vector<uint8_t> &d) {
  std::ofstream f(path, std::ios::binary);
  f.write((const char *)d.data(), d.size());
  return f.good();
}

static bool read_file(const std::string &path, std::vector<uint8_t> *d) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  d->assign(std::istreambuf_iterator<char>(f), std::istreambuf_iterator<char>());
  return true;
}

static int fetch_and_decrypt(const std::string &url, const std::string &key,
                             const std::string &out_path) {
  std::vector<uint8_t> blob, clip;
  std::string err;
  if (!http_get(url, &blob, &err)) {
    fprintf(stderr, "download: %s\n", err.c_str());
    return 1;
  }
  if (!decrypt_blob(blob, key, &clip, &err)) {
    fprintf(stderr, "decrypt: %s\n", err.c_str());
    return 1;
  }
  if (!write_file(out_path, clip)) {
    fprintf(stderr, "write failed: %s\n", out_path.c_str());
    return 1;
  }
  printf("{\"ok\": true, \"bytes\": %zu, \"out\": \"%s\"}\n", clip.size(),
         out_path.c_str());
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: ccviewer "
            "{selftest|decrypt|devices|events|fetch-event|live|release|"
            "toggle-alerts} [--flag value ...]\n");
    return 2;
  }
  std::string cmd = argv[1];
  std::map<std::string, std::string> opt;
  for (int i = 2; i + 1 < argc; i += 2)
    if (argv[i][0] == '-' && argv[i][1] == '-') opt[argv[i] + 2] = argv[i + 1];

  if (cmd == "selftest") {
    int rc = cc_aes_selftest();
    printf("{\"aes_selftest\": %d}\n", rc);
    return rc;
  }
  if (cmd == "decrypt") {
    std::vector<uint8_t> blob, clip;
    std::string err;
    if (!read_file(opt["in"], &blob)) {
      fprintf(stderr, "read failed: %s\n", opt["in"].c_str());
      return 1;
    }
    if (!decrypt_blob(blob, opt["key"], &clip, &err)) {
      fprintf(stderr, "decrypt: %s\n", err.c_str());
      return 1;
    }
    if (!write_file(opt["out"], clip)) return 1;
    printf("{\"ok\": true, \"bytes\": %zu}\n", clip.size());
    return 0;
  }

  std::string base = opt["base"], token = url_encode(opt["token"]);
  std::vector<uint8_t> body;
  std::string err;
  if (cmd == "devices") {  // VideoHelper.kt:238 fetchCameraList
    if (!http_get(base + "/get_live_devicesv2?session_token=" + token, &body,
                  &err)) {
      fprintf(stderr, "%s\n", err.c_str());
      return 1;
    }
    fwrite(body.data(), 1, body.size(), stdout);
    printf("\n");
    return 0;
  }
  if (cmd == "events") {  // VideoHelper.kt:258 events cursor
    std::string newest = opt.count("newest") ? opt["newest"] : "0";
    if (!http_get(base + "/events?session_token=" + token +
                      "&newest_creation_time=" + newest,
                  &body, &err)) {
      fprintf(stderr, "%s\n", err.c_str());
      return 1;
    }
    fwrite(body.data(), 1, body.size(), stdout);
    printf("\n");
    return 0;
  }
  if (cmd == "fetch-event")  // VideoHelper.kt:285 downloadUrl -> decrypt
    return fetch_and_decrypt(opt["url"], opt["key"], opt["out"]);
  if (cmd == "live") {  // VideoHelper.kt:187-232 fetchLiveStreamUrl
    if (!http_get(base + "/get_stream_download_link?session_token=" + token +
                      "&name=" + url_encode(opt["name"]),
                  &body, &err)) {
      fprintf(stderr, "%s\n", err.c_str());
      return 1;
    }
    std::string link =
        json_field(std::string(body.begin(), body.end()), "download_link");
    if (link.empty()) {
      fprintf(stderr, "no download_link in response\n");
      return 1;
    }
    return fetch_and_decrypt(link, opt["key"], opt["out"]);
  }
  if (cmd == "release") {  // DeviceStreamViewController.m:215 cleanup
    http_get(base + "/delete_stream_download_link?session_token=" + token +
                 "&name=" + url_encode(opt["name"]),
             &body, &err);
    printf("{\"ok\": true}\n");
    return 0;
  }
  if (cmd == "toggle-alerts") {  // HomeScreen.kt:1131
    if (!http_get(base + "/toggle_alerts?session_token=" + token + "&name=" +
                      url_encode(opt["name"]) + "&alerts_on=" + opt["on"],
                  &body, &err)) {
      fprintf(stderr, "%s\n", err.c_str());
      return 1;
    }
    printf("{\"ok\": true}\n");
    return 0;
  }
  fprintf(stderr, "unknown command: %s\n", cmd.c_str());
  return 2;
}
