// dcgan_sr_tpu native data path: threaded image decode + preprocess.
//
// TPU-native equivalent of the reference's native data components
// (SURVEY.md §2.4): the `image` C library (libjpeg/libpng decode, bilinear
// scale — donkey_folder.lua:33-44, train-gray-3.lua:256-257), the `threads`
// pthread pool (data/data.lua:30-44), and the FFI path arena
// (data/dataset.lua:196-214).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment):
//   dsr_load_image      decode one file -> float32 CHW [0,1], optional
//                       rec601 luma (torch image.load nc=1 convention) and
//                       endpoint-aligned bilinear resize (same math as
//                       image/ops.py resize_bilinear)
//   dsr_loader_*        a worker-pool batch loader: N threads decode a
//                       sequential indexed batch in parallel (the donkey pool
//                       reshaped for the indexed data path)
//   dsr_index_dir       recursive directory walk -> newline-joined path list
//
// Build: make -C native   (g++ -O2 -shared -fPIC, links libjpeg + libpng)

#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <functional>
#include <algorithm>
#include <mutex>
#include <set>
#include <utility>
#include <queue>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct ImageU8 {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC interleaved
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, ImageU8* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_expand(png);         // palette/gray<8 -> 8-bit
  png_set_strip_16(png);       // 16 -> 8 bit
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, ImageU8* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int c0 = fgetc(f);
  int c1 = fgetc(f);
  rewind(f);
  bool ok = false;
  if (c0 == 0xFF && c1 == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (c0 == 0x89 && c1 == 'P') {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// -------------------------------------------------- resize (bilinear) -----
// Endpoint-aligned sampling: scale = (in-1)/(out-1), identical to the
// framework's device op (image/ops.py::_bilinear_matrix) and torch7
// image.scale's bilinear.
void resize_bilinear_gray(const float* src, int ih, int iw, float* dst,
                          int oh, int ow) {
  std::vector<int> xl(ow), xh(ow);
  std::vector<float> xf(ow);
  const double sx = ow > 1 ? double(iw - 1) / (ow - 1) : 0.0;
  for (int x = 0; x < ow; ++x) {
    double s = x * sx;
    int lo = int(std::floor(s));
    if (lo > iw - 1) lo = iw - 1;
    int hi = lo + 1 < iw ? lo + 1 : iw - 1;
    xl[x] = lo;
    xh[x] = hi;
    xf[x] = float(s - lo);
  }
  const double sy = oh > 1 ? double(ih - 1) / (oh - 1) : 0.0;
  for (int y = 0; y < oh; ++y) {
    double s = y * sy;
    int lo = int(std::floor(s));
    if (lo > ih - 1) lo = ih - 1;
    int hi = lo + 1 < ih ? lo + 1 : ih - 1;
    float fy = float(s - lo);
    const float* r0 = src + size_t(lo) * iw;
    const float* r1 = src + size_t(hi) * iw;
    float* drow = dst + size_t(y) * ow;
    for (int x = 0; x < ow; ++x) {
      float a = r0[xl[x]] * (1.f - xf[x]) + r0[xh[x]] * xf[x];
      float b = r1[xl[x]] * (1.f - xf[x]) + r1[xh[x]] * xf[x];
      drow[x] = a * (1.f - fy) + b * fy;
    }
  }
}

// decoded u8 HWC -> float CHW [0,1]; nc==1 applies Rec.601 luma in float
// (torch image.load(path, 1) convention; see image/io.py)
void to_float_chw(const ImageU8& img, int nc, std::vector<float>* out) {
  const size_t hw = size_t(img.w) * img.h;
  if (nc == 1) {
    out->resize(hw);
    for (size_t i = 0; i < hw; ++i) {
      const uint8_t* p = img.data.data() + i * 3;
      (*out)[i] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) / 255.0f;
    }
  } else {
    out->resize(hw * 3);
    for (size_t i = 0; i < hw; ++i) {
      const uint8_t* p = img.data.data() + i * 3;
      (*out)[i] = p[0] / 255.0f;
      (*out)[hw + i] = p[1] / 255.0f;
      (*out)[2 * hw + i] = p[2] / 255.0f;
    }
  }
}

int load_image_impl(const char* path, int nc, int oh, int ow, float* out) {
  ImageU8 raw;
  if (!decode_file(path, &raw)) return -1;
  std::vector<float> chw;
  to_float_chw(raw, nc, &chw);
  const int channels = nc == 1 ? 1 : 3;
  for (int c = 0; c < channels; ++c) {
    resize_bilinear_gray(chw.data() + size_t(c) * raw.w * raw.h,
                         raw.h, raw.w,
                         out + size_t(c) * oh * ow, oh, ow);
  }
  return 0;
}

// ------------------------------------------------------- batch loader -----
struct Loader {
  std::string route;
  int nc, fine, batch, nthreads;
};

std::string index_path(const Loader& l, long long file_num) {
  char buf[32];
  snprintf(buf, sizeof(buf), "%06lld.jpg", file_num);
  return l.route + buf;
}

// ---------------------------------------------------------------- encode --
// float CHW [0,1] -> u8 HWC, round-half-to-even (numpy np.round / nearbyint
// under the default FP environment) then clamp — bit-matching the PIL path
// in image/io.py::save_image so the native encoder is a drop-in.
void chw_to_bytes(const float* data, int c, int h, int w,
                  std::vector<uint8_t>* out) {
  const size_t hw = size_t(h) * w;
  out->resize(hw * c);
  for (size_t i = 0; i < hw; ++i) {
    for (int ch = 0; ch < c; ++ch) {
      float v = nearbyintf(data[size_t(ch) * hw + i] * 255.0f);
      if (v < 0.f) v = 0.f;
      if (v > 255.f) v = 255.f;
      (*out)[i * c + ch] = static_cast<uint8_t>(v);
    }
  }
}

int encode_png(const char* path, const uint8_t* hwc, int c, int h, int w) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  if (!png) { fclose(f); return -1; }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(f);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8,
               c == 1 ? PNG_COLOR_TYPE_GRAY : PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(hwc + size_t(y) * w * c);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return 0;
}

int encode_jpeg(const char* path, const uint8_t* hwc, int c, int h, int w,
                int quality) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = c == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<JSAMPROW>(hwc + size_t(cinfo.next_scanline) * w * c);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

int dsr_load_image(const char* path, int nc, int out_h, int out_w, float* out) {
  return load_image_impl(path, nc, out_h, out_w, out);
}

// Save float CHW [0,1] (c = 1 gray or 3 RGB) as PNG — the sample-dump path
// (train.lua:306-326 saves through image.save; min-max display normalization
// happens in the caller, image/io.py::save_display).
int dsr_save_png(const char* path, const float* data, int c, int h, int w) {
  if (c != 1 && c != 3) return -1;
  std::vector<uint8_t> hwc;
  chw_to_bytes(data, c, h, w, &hwc);
  return encode_png(path, hwc.data(), c, h, w);
}

int dsr_save_jpeg(const char* path, const float* data, int c, int h, int w,
                  int quality) {
  if (c != 1 && c != 3) return -1;
  std::vector<uint8_t> hwc;
  chw_to_bytes(data, c, h, w, &hwc);
  return encode_jpeg(path, hwc.data(), c, h, w, quality);
}

void* dsr_loader_create(const char* route, int nc, int fine, int batch,
                        int nthreads) {
  auto* l = new Loader;
  l->route = route;
  if (!l->route.empty() && l->route.back() != '/') l->route += '/';
  l->nc = nc;
  l->fine = fine;
  l->batch = batch;
  l->nthreads = nthreads > 0 ? nthreads : 1;
  return l;
}

// Load files file_set*batch + [1..batch] into out (batch, nc, fine, fine).
// Returns number of successfully decoded images (failures leave zeros).
int dsr_loader_load_batch(void* handle, long long file_set, float* out) {
  auto* l = static_cast<Loader*>(handle);
  const size_t per = size_t(l->nc) * l->fine * l->fine;
  std::atomic<int> next(0), ok(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= l->batch) return;
      long long num = file_set * l->batch + i + 1;
      std::string p = index_path(*l, num);
      float* dst = out + size_t(i) * per;
      if (load_image_impl(p.c_str(), l->nc, l->fine, l->fine, dst) == 0) {
        ok.fetch_add(1);
      } else {
        memset(dst, 0, per * sizeof(float));
      }
    }
  };
  std::vector<std::thread> ts;
  int n = std::min(l->nthreads, l->batch);
  ts.reserve(n);
  for (int t = 0; t < n; ++t) ts.emplace_back(work);
  for (auto& t : ts) t.join();
  return ok.load();
}

void dsr_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

// Recursive scan of root for image files; writes newline-joined paths into
// out_buf (cap bytes).  Returns bytes needed (call twice to size), or -1.
long long dsr_index_dir(const char* root, char* out_buf, long long cap) {
  std::vector<std::string> stack{root};
  std::string all;
  // stat() follows symlinks, so a directory symlink cycle would loop the
  // walk forever: track visited (device, inode) pairs and enter each
  // directory once.
  std::set<std::pair<unsigned long long, unsigned long long>> seen;
  {
    struct stat st;
    if (!stack.empty() && stat(stack.back().c_str(), &st) == 0)
      seen.insert({(unsigned long long)st.st_dev,
                   (unsigned long long)st.st_ino});
  }
  while (!stack.empty()) {
    std::string dir = stack.back();
    stack.pop_back();
    DIR* d = opendir(dir.c_str());
    if (!d) continue;
    std::vector<std::string> entries;
    while (dirent* e = readdir(d)) {
      if (e->d_name[0] == '.') continue;
      entries.push_back(e->d_name);
    }
    closedir(d);
    std::sort(entries.begin(), entries.end());
    for (const auto& name : entries) {
      std::string full = dir + "/" + name;
      struct stat st;
      if (stat(full.c_str(), &st) != 0) continue;
      if (S_ISDIR(st.st_mode)) {
        if (seen.insert({(unsigned long long)st.st_dev,
                         (unsigned long long)st.st_ino}).second)
          stack.push_back(full);
      } else {
        auto dot = name.rfind('.');
        if (dot == std::string::npos) continue;
        std::string ext = name.substr(dot);
        for (auto& ch : ext) ch = std::tolower(ch);
        // only extensions decode_file can actually decode (JPEG/PNG
        // magic): indexing .bmp/.ppm would hand the loader guaranteed
        // decode failures
        if (ext == ".jpg" || ext == ".jpeg" || ext == ".png") {
          all += full;
          all += '\n';
        }
      }
    }
  }
  long long need = static_cast<long long>(all.size());
  if (out_buf && cap >= need) memcpy(out_buf, all.data(), need);
  return need;
}

}  // extern "C"
