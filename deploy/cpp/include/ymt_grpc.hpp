// Minimal dependency-free gRPC client for the ymt.Inference service.
//
// The Triton-client analog of the reference's YOLO11-Triton-CPP example
// (reference examples/YOLO11-Triton-CPP/inference.cpp links the Triton client
// libraries; this image ships no grpc++/protobuf-dev, so this header speaks
// the wire protocol directly): a small HTTP/2 client implementing exactly the
// subset gRPC unary calls need —
//   * client preface + SETTINGS exchange (header-table-size 0 announced so
//     the server encoder cannot use HPACK dynamic indexing)
//   * HPACK request headers as static-table indexes + raw literals (legal:
//     Huffman is optional for encoders)
//   * DATA frames carrying the 5-byte-prefixed gRPC message, chunked against
//     connection/stream flow-control windows and peer max-frame-size
//   * response DATA collection; trailers scanned with a non-Huffman HPACK
//     reader (Huffman-coded trailer names are skipped; for unary calls a
//     complete response message implies grpc-status 0, which is what the
//     status fallback reports)
//
// Payloads use the ymt tensor codec (yolo_master_tpu/serving.py):
//   [4-byte LE header length][JSON header][raw C-contiguous buffers]
//   header = {"tensors": [{"name","dtype","shape"}...], "meta": {...}}
//
// Single-threaded, blocking, one in-flight stream per call.

#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace ymt {

// ---------------------------------------------------------------------------
// ymt tensor codec
// ---------------------------------------------------------------------------
struct Tensor {
  std::string dtype;               // "float32", "int32", "bool", ...
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;       // raw C-contiguous buffer

  size_t elems() const {
    size_t n = 1;
    for (auto d : shape) n *= static_cast<size_t>(d);
    return n;
  }
  const float* f32() const { return reinterpret_cast<const float*>(data.data()); }
};

inline size_t dtype_size(const std::string& dt) {
  if (dt == "float32" || dt == "int32" || dt == "uint32") return 4;
  if (dt == "float64" || dt == "int64") return 8;
  if (dt == "float16" || dt == "bfloat16" || dt == "int16") return 2;
  if (dt == "uint8" || dt == "int8" || dt == "bool") return 1;
  throw std::runtime_error("unknown dtype " + dt);
}

// tiny JSON emit/scan — the codec headers are flat and machine-generated,
// full JSON parsing is not required (values are numbers/strings/arrays).
inline std::string json_escape(const std::string& s) {
  std::string o;
  for (char c : s) {
    if (c == '"' || c == '\\') { o += '\\'; o += c; }
    else o += c;
  }
  return o;
}

inline std::vector<uint8_t> encode_tensors(const std::map<std::string, Tensor>& tensors) {
  std::string hdr = "{\"tensors\": [";
  bool first = true;
  for (auto& [name, t] : tensors) {
    if (!first) hdr += ", ";
    first = false;
    hdr += "{\"name\": \"" + json_escape(name) + "\", \"dtype\": \"" + t.dtype + "\", \"shape\": [";
    for (size_t i = 0; i < t.shape.size(); ++i)
      hdr += (i ? ", " : "") + std::to_string(t.shape[i]);
    hdr += "]}";
  }
  hdr += "], \"meta\": {}}";
  std::vector<uint8_t> out(4 + hdr.size());
  uint32_t hl = static_cast<uint32_t>(hdr.size());
  std::memcpy(out.data(), &hl, 4);  // little-endian host assumed (x86/arm-le)
  std::memcpy(out.data() + 4, hdr.data(), hdr.size());
  for (auto& [name, t] : tensors) out.insert(out.end(), t.data.begin(), t.data.end());
  return out;
}

// pull "key": <scalar or array or string> out of the flat JSON header
inline std::string json_find(const std::string& j, const std::string& key) {
  auto p = j.find("\"" + key + "\"");
  if (p == std::string::npos) return "";
  p = j.find(':', p);
  if (p == std::string::npos) return "";
  ++p;
  while (p < j.size() && (j[p] == ' ')) ++p;
  if (j[p] == '"') {
    auto e = j.find('"', p + 1);
    return j.substr(p + 1, e - p - 1);
  }
  if (j[p] == '[') {
    int depth = 0;
    size_t s = p;
    for (; p < j.size(); ++p) {
      if (j[p] == '[') ++depth;
      if (j[p] == ']' && --depth == 0) break;
    }
    return j.substr(s, p - s + 1);
  }
  size_t e = j.find_first_of(",}", p);
  return j.substr(p, e - p);
}

inline std::map<std::string, Tensor> decode_tensors(const std::vector<uint8_t>& blob,
                                                    std::string* meta_json = nullptr) {
  if (blob.size() < 4) throw std::runtime_error("short ymt payload");
  uint32_t hl;
  std::memcpy(&hl, blob.data(), 4);
  if (4 + hl > blob.size()) throw std::runtime_error("bad ymt header length");
  std::string hdr(reinterpret_cast<const char*>(blob.data() + 4), hl);
  if (meta_json) {
    auto m = hdr.find("\"meta\"");
    *meta_json = m == std::string::npos ? "{}" : hdr.substr(m);
  }
  std::map<std::string, Tensor> out;
  size_t off = 4 + hl;
  // walk the "tensors" array entries in order (scan bounded to the array —
  // the meta section can carry look-alike {"name": ...} objects)
  size_t pos = hdr.find("\"tensors\"");
  size_t tend = hdr.size();
  if (pos != std::string::npos) {
    size_t open = hdr.find('[', pos);
    int depth = 0;
    for (size_t i = open; i < hdr.size(); ++i) {
      if (hdr[i] == '[') ++depth;
      if (hdr[i] == ']' && --depth == 0) { tend = i; break; }
    }
  }
  std::vector<std::string> order;
  while (true) {
    pos = hdr.find("{\"name\"", pos);
    if (pos == std::string::npos || pos >= tend) break;
    size_t end = hdr.find('}', pos);
    std::string entry = hdr.substr(pos, end - pos + 1);
    Tensor t;
    std::string name = json_find(entry, "name");
    t.dtype = json_find(entry, "dtype");
    std::string shp = json_find(entry, "shape");
    // parse [a, b, c]
    for (size_t i = 1; i < shp.size();) {
      while (i < shp.size() && (shp[i] == ' ' || shp[i] == ',')) ++i;
      if (i >= shp.size() || shp[i] == ']') break;
      t.shape.push_back(std::strtoll(shp.c_str() + i, nullptr, 10));
      while (i < shp.size() && shp[i] != ',' && shp[i] != ']') ++i;
    }
    size_t nbytes = t.elems() * dtype_size(t.dtype);
    if (off + nbytes > blob.size()) throw std::runtime_error("truncated tensor " + name);
    t.data.assign(blob.begin() + off, blob.begin() + off + nbytes);
    off += nbytes;
    out.emplace(name, std::move(t));
    order.push_back(name);
    pos = end;
  }
  return out;
}

// ---------------------------------------------------------------------------
// HTTP/2 framing
// ---------------------------------------------------------------------------
namespace h2 {

enum FrameType : uint8_t {
  DATA = 0x0, HEADERS = 0x1, RST_STREAM = 0x3, SETTINGS = 0x4,
  PING = 0x6, GOAWAY = 0x7, WINDOW_UPDATE = 0x8, CONTINUATION = 0x9,
};
enum Flags : uint8_t { END_STREAM = 0x1, ACK = 0x1, END_HEADERS = 0x4, PADDED = 0x8 };

struct Frame {
  uint8_t type = 0, flags = 0;
  uint32_t stream = 0;
  std::vector<uint8_t> payload;
};

class Conn {
 public:
  Conn(const std::string& host, int port) {
    addrinfo hints{}, *res = nullptr;
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints, &res) != 0 || !res)
      throw std::runtime_error("resolve failed: " + host);
    fd_ = ::socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd_ < 0 || ::connect(fd_, res->ai_addr, res->ai_addrlen) != 0) {
      freeaddrinfo(res);
      throw std::runtime_error("connect failed: " + host + ":" + std::to_string(port));
    }
    freeaddrinfo(res);
    authority_ = host + ":" + std::to_string(port);
    // client preface
    static const char kPreface[] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n";
    write_all(reinterpret_cast<const uint8_t*>(kPreface), sizeof(kPreface) - 1);
    // SETTINGS: header-table-size=0 (disable server HPACK dynamic table),
    // initial-window-size=2^24 (large response windows)
    std::vector<uint8_t> s;
    put_setting(s, 0x1, 0);
    put_setting(s, 0x4, 1u << 24);
    send_frame(SETTINGS, 0, 0, s);
    // widen the connection receive window
    std::vector<uint8_t> wu(4);
    uint32_t inc = htonl((1u << 30) - 65535);
    std::memcpy(wu.data(), &inc, 4);
    send_frame(WINDOW_UPDATE, 0, 0, wu);
  }
  ~Conn() { if (fd_ >= 0) ::close(fd_); }

  // one unary gRPC call; returns the raw response message (without the
  // 5-byte gRPC prefix). grpc_status: parsed from trailers when readable,
  // else inferred (0 if a complete message arrived).
  std::vector<uint8_t> unary(const std::string& path, const std::vector<uint8_t>& msg,
                             int* grpc_status = nullptr) {
    uint32_t sid = next_stream_;
    next_stream_ += 2;
    send_headers(sid, path);
    send_grpc_message(sid, msg);
    return recv_response(sid, grpc_status);
  }

 private:
  int fd_ = -1;
  uint32_t next_stream_ = 1;
  std::string authority_;
  int64_t conn_send_window_ = 65535;
  int64_t peer_initial_window_ = 65535;
  uint32_t peer_max_frame_ = 16384;
  std::map<uint32_t, int64_t> stream_send_window_;

  static void put_setting(std::vector<uint8_t>& v, uint16_t id, uint32_t val) {
    v.push_back(id >> 8); v.push_back(id & 0xff);
    v.push_back(val >> 24); v.push_back((val >> 16) & 0xff);
    v.push_back((val >> 8) & 0xff); v.push_back(val & 0xff);
  }

  void write_all(const uint8_t* p, size_t n) {
    while (n) {
      ssize_t w = ::write(fd_, p, n);
      if (w <= 0) throw std::runtime_error("socket write failed");
      p += w; n -= static_cast<size_t>(w);
    }
  }
  void read_all(uint8_t* p, size_t n) {
    while (n) {
      ssize_t r = ::read(fd_, p, n);
      if (r <= 0) throw std::runtime_error("socket closed mid-frame");
      p += r; n -= static_cast<size_t>(r);
    }
  }

  void send_frame(uint8_t type, uint8_t flags, uint32_t stream, const std::vector<uint8_t>& payload) {
    uint8_t hdr[9];
    uint32_t len = static_cast<uint32_t>(payload.size());
    hdr[0] = len >> 16; hdr[1] = (len >> 8) & 0xff; hdr[2] = len & 0xff;
    hdr[3] = type; hdr[4] = flags;
    uint32_t sn = htonl(stream & 0x7fffffff);
    std::memcpy(hdr + 5, &sn, 4);
    write_all(hdr, 9);
    if (len) write_all(payload.data(), len);
  }

  Frame recv_frame() {
    uint8_t hdr[9];
    read_all(hdr, 9);
    Frame f;
    uint32_t len = (hdr[0] << 16) | (hdr[1] << 8) | hdr[2];
    f.type = hdr[3]; f.flags = hdr[4];
    uint32_t sn;
    std::memcpy(&sn, hdr + 5, 4);
    f.stream = ntohl(sn) & 0x7fffffff;
    f.payload.resize(len);
    if (len) read_all(f.payload.data(), len);
    return f;
  }

  // HPACK integer with n-bit prefix
  static void hp_int(std::vector<uint8_t>& out, uint8_t first, int prefix, uint64_t v) {
    uint64_t cap = (1u << prefix) - 1;
    if (v < cap) { out.push_back(first | static_cast<uint8_t>(v)); return; }
    out.push_back(first | static_cast<uint8_t>(cap));
    v -= cap;
    while (v >= 128) { out.push_back(0x80 | (v & 0x7f)); v >>= 7; }
    out.push_back(static_cast<uint8_t>(v));
  }
  static void hp_str(std::vector<uint8_t>& out, const std::string& s) {
    hp_int(out, 0x00, 7, s.size());  // raw (no Huffman)
    out.insert(out.end(), s.begin(), s.end());
  }

  void send_headers(uint32_t sid, const std::string& path) {
    std::vector<uint8_t> b;
    b.push_back(0x83);                       // :method: POST   (static idx 3)
    b.push_back(0x86);                       // :scheme: http   (static idx 6)
    hp_int(b, 0x00, 4, 4); hp_str(b, path);  // :path literal, name idx 4
    hp_int(b, 0x00, 4, 1); hp_str(b, authority_);  // :authority, name idx 1
    hp_int(b, 0x00, 4, 31); hp_str(b, "application/grpc");  // content-type idx 31
    b.push_back(0x00); hp_str(b, "te"); hp_str(b, "trailers");
    send_frame(HEADERS, END_HEADERS, sid, b);
    stream_send_window_[sid] = peer_initial_window_;
  }

  void handle_control(const Frame& f) {
    if (f.type == SETTINGS && !(f.flags & ACK)) {
      for (size_t i = 0; i + 6 <= f.payload.size(); i += 6) {
        uint16_t id = (f.payload[i] << 8) | f.payload[i + 1];
        uint32_t val = (f.payload[i + 2] << 24) | (f.payload[i + 3] << 16) |
                       (f.payload[i + 4] << 8) | f.payload[i + 5];
        if (id == 0x4) peer_initial_window_ = val;
        if (id == 0x5) peer_max_frame_ = val;
      }
      send_frame(SETTINGS, ACK, 0, {});
    } else if (f.type == PING && !(f.flags & ACK)) {
      send_frame(PING, ACK, 0, f.payload);
    } else if (f.type == WINDOW_UPDATE) {
      uint32_t inc;
      std::memcpy(&inc, f.payload.data(), 4);
      inc = ntohl(inc) & 0x7fffffff;
      if (f.stream == 0) conn_send_window_ += inc;
      else stream_send_window_[f.stream] += inc;
    } else if (f.type == GOAWAY) {
      throw std::runtime_error("server sent GOAWAY");
    } else if (f.type == RST_STREAM) {
      throw std::runtime_error("stream reset by server");
    }
  }

  void send_grpc_message(uint32_t sid, const std::vector<uint8_t>& msg) {
    std::vector<uint8_t> body(5 + msg.size());
    body[0] = 0;  // uncompressed
    uint32_t be = htonl(static_cast<uint32_t>(msg.size()));
    std::memcpy(body.data() + 1, &be, 4);
    if (!msg.empty()) std::memcpy(body.data() + 5, msg.data(), msg.size());
    size_t off = 0;
    while (off < body.size()) {
      int64_t win = std::min(conn_send_window_, stream_send_window_[sid]);
      if (win <= 0) { handle_control(recv_frame()); continue; }
      size_t chunk = std::min<size_t>({body.size() - off, static_cast<size_t>(win),
                                       static_cast<size_t>(peer_max_frame_)});
      std::vector<uint8_t> part(body.begin() + off, body.begin() + off + chunk);
      bool last = off + chunk == body.size();
      send_frame(DATA, last ? END_STREAM : 0, sid, part);
      conn_send_window_ -= static_cast<int64_t>(chunk);
      stream_send_window_[sid] -= static_cast<int64_t>(chunk);
      off += chunk;
    }
  }

  // best-effort non-Huffman HPACK scan for grpc-status in a trailer block
  static int scan_grpc_status(const std::vector<uint8_t>& b) {
    std::string raw(b.begin(), b.end());
    auto p = raw.find("grpc-status");
    if (p == std::string::npos || p + 12 >= raw.size()) return -1;
    // value follows as a length-prefixed string (raw encoding only)
    size_t vp = p + 11;
    uint8_t vlen = static_cast<uint8_t>(raw[vp]) & 0x7f;
    bool huff = static_cast<uint8_t>(raw[vp]) & 0x80;
    if (huff || vp + 1 + vlen > raw.size()) return -1;
    return std::atoi(raw.substr(vp + 1, vlen).c_str());
  }

  std::vector<uint8_t> recv_response(uint32_t sid, int* grpc_status) {
    std::vector<uint8_t> data;
    int status = -1;
    bool saw_headers = false;
    int64_t recv_since_update = 0;
    while (true) {
      Frame f = recv_frame();
      if (f.stream != sid) { handle_control(f); continue; }
      if (f.type == HEADERS) {
        int s = scan_grpc_status(f.payload);
        if (s >= 0) status = s;
        saw_headers = true;
        if (f.flags & END_STREAM) break;
      } else if (f.type == DATA) {
        data.insert(data.end(), f.payload.begin(), f.payload.end());
        recv_since_update += static_cast<int64_t>(f.payload.size());
        if (recv_since_update > (1 << 20)) {  // replenish our receive windows
          std::vector<uint8_t> wu(4);
          uint32_t inc = htonl(static_cast<uint32_t>(recv_since_update));
          std::memcpy(wu.data(), &inc, 4);
          send_frame(WINDOW_UPDATE, 0, 0, wu);
          send_frame(WINDOW_UPDATE, 0, sid, wu);
          recv_since_update = 0;
        }
        if (f.flags & END_STREAM) break;
      } else {
        handle_control(f);
      }
    }
    (void)saw_headers;
    std::vector<uint8_t> msg;
    if (data.size() >= 5) {
      uint32_t mlen;
      std::memcpy(&mlen, data.data() + 1, 4);
      mlen = ntohl(mlen);
      if (5 + mlen <= data.size()) msg.assign(data.begin() + 5, data.begin() + 5 + mlen);
    }
    if (grpc_status) *grpc_status = status >= 0 ? status : (msg.empty() ? 2 /*UNKNOWN*/ : 0);
    return msg;
  }
};

}  // namespace h2

// ---------------------------------------------------------------------------
// InferenceClient — the Triton-style client surface
// ---------------------------------------------------------------------------
class InferenceClient {
 public:
  InferenceClient(const std::string& host, int port) : conn_(host, port) {}

  bool server_live() {
    int status = 0;
    auto resp = conn_.unary("/ymt.Inference/ServerLive", encode_tensors({}), &status);
    std::string meta;
    decode_tensors(resp, &meta);
    return status == 0 && meta.find("\"live\": true") != std::string::npos;
  }

  std::string model_metadata() {
    auto resp = conn_.unary("/ymt.Inference/ModelMetadata", encode_tensors({}));
    std::string meta;
    decode_tensors(resp, &meta);
    return meta;
  }

  // images: [B, H, W, 3] float32 in [0,1], already letterboxed
  std::map<std::string, Tensor> infer(const Tensor& images, int* status = nullptr) {
    std::map<std::string, Tensor> req;
    req.emplace("images", images);
    auto resp = conn_.unary("/ymt.Inference/ModelInfer", encode_tensors(req), status);
    if (resp.empty()) throw std::runtime_error("empty ModelInfer response");
    return decode_tensors(resp);
  }

 private:
  h2::Conn conn_;
};

}  // namespace ymt
