// vsf_native: native host-side runtime for the TPU SLAM frontend.
//
// The reference does its host-side work (rosbag parsing, cv::imdecode) in
// C++ on one thread (reference: src/slam_frontend_main.cc:98-109, :271-328);
// this library is the TPU framework's native equivalent: a ROS1 bag record
// scanner and a multithreaded JPEG decoder that keep the host data path off
// the Python interpreter and ahead of the device loop.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency):
//   vsf_decode_jpeg_gray        one JPEG -> grayscale u8 buffer
//   vsf_decode_jpeg_batch       N JPEGs decoded on a thread pool
//   vsf_bag_open/scan/close     bag record index (topic, time, offset, size)
//
// Build: make -C native   (links libjpeg, pthread).

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decoding
// ---------------------------------------------------------------------------

struct VsfJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void vsf_jpeg_error_exit(j_common_ptr cinfo) {
  VsfJpegErr* err = reinterpret_cast<VsfJpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG buffer to grayscale u8. Returns 0 on success.
// If out == nullptr, only reports dimensions.
int vsf_decode_jpeg_gray(const uint8_t* data, int64_t len, uint8_t* out,
                         int64_t out_capacity, int32_t* width,
                         int32_t* height) {
  jpeg_decompress_struct cinfo;
  VsfJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = vsf_jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  *width = static_cast<int32_t>(cinfo.output_width);
  *height = static_cast<int32_t>(cinfo.output_height);
  if (out == nullptr) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  const int64_t needed =
      static_cast<int64_t>(cinfo.output_width) * cinfo.output_height;
  if (out_capacity < needed) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<int64_t>(cinfo.output_scanline) *
                             cinfo.output_width;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode `n` JPEG buffers concurrently into one (n, height, width) u8 tensor.
// All images must share dimensions (width/height of image 0). Images failing
// to decode are zero-filled and flagged in `status`.
int vsf_decode_jpeg_batch(const uint8_t** datas, const int64_t* lens,
                          int32_t n, uint8_t* out, int32_t width,
                          int32_t height, int32_t num_threads,
                          int32_t* status) {
  if (n <= 0) return 0;
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  if (num_threads > n) num_threads = n;
  const int64_t frame = static_cast<int64_t>(width) * height;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= n) return;
      int32_t w = 0, h = 0;
      uint8_t* dst = out + frame * i;
      const int rc =
          vsf_decode_jpeg_gray(datas[i], lens[i], dst, frame, &w, &h);
      if (rc != 0 || w != width || h != height) {
        std::memset(dst, 0, static_cast<size_t>(frame));
        status[i] = rc != 0 ? rc : -4;
      } else {
        status[i] = 0;
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int32_t t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// ---------------------------------------------------------------------------
// ROS1 bag scanning (format 2.0; uncompressed chunks)
// ---------------------------------------------------------------------------

struct VsfBagRecord {
  int32_t conn;       // connection id
  int64_t time_ns;    // message time
  int64_t offset;     // absolute file offset of the serialized message body
  int64_t size;       // body size in bytes
};

struct VsfBagConnection {
  int32_t conn;
  char topic[256];
  char type[128];
};

struct VsfBag {
  std::vector<uint8_t> contents;
  std::vector<VsfBagRecord> records;
  std::vector<VsfBagConnection> connections;
};

static bool read_u32(const std::vector<uint8_t>& b, size_t off, uint32_t* v) {
  if (off + 4 > b.size()) return false;
  std::memcpy(v, b.data() + off, 4);
  return true;
}

// Parse header fields; returns map lookups via small linear scans.
struct HeaderField {
  const uint8_t* value;
  uint32_t len;
};

static bool find_field(const uint8_t* header, uint32_t hlen, const char* name,
                       HeaderField* out) {
  const size_t name_len = std::strlen(name);
  uint32_t off = 0;
  while (off + 4 <= hlen) {
    uint32_t flen;
    std::memcpy(&flen, header + off, 4);
    off += 4;
    if (off + flen > hlen) return false;
    const uint8_t* field = header + off;
    const uint8_t* eq =
        static_cast<const uint8_t*>(std::memchr(field, '=', flen));
    if (eq != nullptr) {
      const size_t klen = static_cast<size_t>(eq - field);
      if (klen == name_len && std::memcmp(field, name, klen) == 0) {
        out->value = eq + 1;
        out->len = flen - static_cast<uint32_t>(klen) - 1;
        return true;
      }
    }
    off += flen;
  }
  return false;
}

static void scan_records(VsfBag* bag, size_t begin, size_t end,
                         int64_t file_base);

// Open + fully index a bag. Returns an opaque handle or nullptr.
void* vsf_bag_open(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  auto bag = new VsfBag();
  f.seekg(0, std::ios::end);
  const std::streamoff size = f.tellg();
  f.seekg(0);
  bag->contents.resize(static_cast<size_t>(size));
  f.read(reinterpret_cast<char*>(bag->contents.data()), size);
  static const char kMagic[] = "#ROSBAG V2.0\n";
  const size_t magic_len = sizeof(kMagic) - 1;
  if (bag->contents.size() < magic_len ||
      std::memcmp(bag->contents.data(), kMagic, magic_len) != 0) {
    delete bag;
    return nullptr;
  }
  scan_records(bag, magic_len, bag->contents.size(), 0);
  return bag;
}

static void scan_records(VsfBag* bag, size_t begin, size_t end,
                         int64_t file_base) {
  size_t off = begin;
  auto& b = bag->contents;
  while (off + 4 <= end) {
    uint32_t hlen;
    if (!read_u32(b, off, &hlen)) return;
    off += 4;
    if (off + hlen + 4 > end) return;
    const uint8_t* header = b.data() + off;
    off += hlen;
    uint32_t dlen;
    if (!read_u32(b, off, &dlen)) return;
    off += 4;
    if (off + dlen > end) return;
    const size_t data_off = off;
    off += dlen;

    HeaderField opf;
    if (!find_field(header, hlen, "op", &opf) || opf.len < 1) continue;
    const uint8_t op = opf.value[0];
    if (op == 0x05) {  // chunk
      HeaderField comp;
      const bool uncompressed =
          !find_field(header, hlen, "compression", &comp) ||
          (comp.len == 4 && std::memcmp(comp.value, "none", 4) == 0);
      if (uncompressed) {
        scan_records(bag, data_off, data_off + dlen, file_base);
      }
      // compressed chunks: Python fallback handles them
    } else if (op == 0x07) {  // connection
      HeaderField cf;
      if (!find_field(header, hlen, "conn", &cf) || cf.len != 4) continue;
      VsfBagConnection c;
      std::memcpy(&c.conn, cf.value, 4);
      c.topic[0] = 0;
      c.type[0] = 0;
      // Connection data is itself a header block with topic/type fields.
      HeaderField topic_f, type_f;
      if (find_field(b.data() + data_off, dlen, "topic", &topic_f)) {
        const uint32_t n = topic_f.len < 255 ? topic_f.len : 255;
        std::memcpy(c.topic, topic_f.value, n);
        c.topic[n] = 0;
      }
      if (find_field(b.data() + data_off, dlen, "type", &type_f)) {
        const uint32_t n = type_f.len < 127 ? type_f.len : 127;
        std::memcpy(c.type, type_f.value, n);
        c.type[n] = 0;
      }
      // Dedup (connections appear in chunks and in the index section).
      bool seen = false;
      for (const auto& existing : bag->connections) {
        if (existing.conn == c.conn) {
          seen = true;
          break;
        }
      }
      if (!seen) bag->connections.push_back(c);
    } else if (op == 0x02) {  // message data
      HeaderField cf, tf;
      if (!find_field(header, hlen, "conn", &cf) || cf.len != 4) continue;
      if (!find_field(header, hlen, "time", &tf) || tf.len != 8) continue;
      VsfBagRecord r;
      std::memcpy(&r.conn, cf.value, 4);
      uint64_t t;
      std::memcpy(&t, tf.value, 8);
      r.time_ns = static_cast<int64_t>(t);
      r.offset = file_base + static_cast<int64_t>(data_off);
      r.size = static_cast<int64_t>(dlen);
      bag->records.push_back(r);
    }
  }
}

int32_t vsf_bag_num_records(void* handle) {
  return static_cast<int32_t>(static_cast<VsfBag*>(handle)->records.size());
}

int32_t vsf_bag_num_connections(void* handle) {
  return static_cast<int32_t>(
      static_cast<VsfBag*>(handle)->connections.size());
}

void vsf_bag_get_connections(void* handle, VsfBagConnection* out) {
  auto bag = static_cast<VsfBag*>(handle);
  std::memcpy(out, bag->connections.data(),
              bag->connections.size() * sizeof(VsfBagConnection));
}

void vsf_bag_get_records(void* handle, VsfBagRecord* out) {
  auto bag = static_cast<VsfBag*>(handle);
  std::memcpy(out, bag->records.data(),
              bag->records.size() * sizeof(VsfBagRecord));
}

// Copy a message body out of the mapped bag.
int vsf_bag_read(void* handle, int64_t offset, int64_t size, uint8_t* out) {
  auto bag = static_cast<VsfBag*>(handle);
  if (offset < 0 ||
      static_cast<size_t>(offset + size) > bag->contents.size()) {
    return -1;
  }
  std::memcpy(out, bag->contents.data() + offset, static_cast<size_t>(size));
  return 0;
}

const uint8_t* vsf_bag_data_ptr(void* handle, int64_t offset) {
  auto bag = static_cast<VsfBag*>(handle);
  return bag->contents.data() + offset;
}

void vsf_bag_close(void* handle) { delete static_cast<VsfBag*>(handle); }

}  // extern "C"
