// Native threaded image-loading runtime for envgs_tpu.
//
// TPU-native counterpart of the reference's host-side data pipeline
// (easyvolcap's multi-worker DataLoader + shared-memory image bytes,
// /root/reference/easyvolcap/dataloaders/volumetric_video_dataloader.py:72-111
// and volumetric_video_dataset.py:372-555): a C++ worker pool that decodes
// JPEG/PNG, undistorts (OpenCV 5-term model), resizes, and hands float32
// HWC buffers to Python through ctypes — overlapping host IO with device
// compute without Python processes or the GIL.
//
// Build: make -C native   ->  native/libenvgs_loader.so
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Image {
    int h = 0, w = 0, c = 0;
    std::vector<float> data;  // HWC float32 in [0, 1]
};

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jerr.error_exit = [](j_common_ptr ci) { throw std::runtime_error("jpeg"); };
    try {
        jpeg_create_decompress(&cinfo);
        jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
        jpeg_read_header(&cinfo, TRUE);
        cinfo.out_color_space = JCS_RGB;
        jpeg_start_decompress(&cinfo);
        out->h = cinfo.output_height;
        out->w = cinfo.output_width;
        out->c = 3;
        out->data.resize(size_t(out->h) * out->w * 3);
        std::vector<uint8_t> row(size_t(out->w) * 3);
        uint8_t* rp = row.data();
        for (int y = 0; y < out->h; ++y) {
            jpeg_read_scanlines(&cinfo, &rp, 1);
            float* dst = out->data.data() + size_t(y) * out->w * 3;
            for (int i = 0; i < out->w * 3; ++i) dst[i] = row[i] * (1.f / 255.f);
        }
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return true;
    } catch (...) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
}

struct PngReadCtx {
    const uint8_t* buf;
    size_t len, off;
};

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
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
    PngReadCtx ctx{buf, len, 0};
    png_set_read_fn(png, &ctx, [](png_structp p, png_bytep data, png_size_t n) {
        auto* c = static_cast<PngReadCtx*>(png_get_io_ptr(p));
        if (c->off + n > c->len) png_error(p, "short read");
        memcpy(data, c->buf + c->off, n);
        c->off += n;
    });
    png_read_info(png, info);
    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int depth = png_get_bit_depth(png, info);
    int color = png_get_color_type(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (depth == 16) png_set_strip_16(png);
    png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    out->h = h;
    out->w = w;
    out->c = 3;
    out->data.resize(size_t(h) * w * 3);
    std::vector<uint8_t> row(png_get_rowbytes(png, info));
    for (png_uint_32 y = 0; y < h; ++y) {
        png_read_row(png, row.data(), nullptr);
        float* dst = out->data.data() + size_t(y) * w * 3;
        for (png_uint_32 i = 0; i < w * 3; ++i)
            dst[i] = row[i] * (1.f / 255.f);
    }
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_any(const std::vector<uint8_t>& buf, Image* out) {
    if (buf.size() > 3 && buf[0] == 0xFF && buf[1] == 0xD8)
        return decode_jpeg(buf.data(), buf.size(), out);
    if (buf.size() > 8 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G')
        return decode_png(buf.data(), buf.size(), out);
    // try both
    return decode_jpeg(buf.data(), buf.size(), out) ||
           decode_png(buf.data(), buf.size(), out);
}

void resize_bilinear(const Image& src, int H, int W, float* dst) {
    const float sy = float(src.h) / H, sx = float(src.w) / W;
    for (int y = 0; y < H; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = std::max(0, std::min(src.h - 1, int(std::floor(fy))));
        int y1 = std::min(src.h - 1, y0 + 1);
        float wy = fy - std::floor(fy);
        if (fy < 0) wy = 0;
        for (int x = 0; x < W; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = std::max(0, std::min(src.w - 1, int(std::floor(fx))));
            int x1 = std::min(src.w - 1, x0 + 1);
            float wx = fx - std::floor(fx);
            if (fx < 0) wx = 0;
            for (int ch = 0; ch < 3; ++ch) {
                float v00 = src.data[(size_t(y0) * src.w + x0) * 3 + ch];
                float v01 = src.data[(size_t(y0) * src.w + x1) * 3 + ch];
                float v10 = src.data[(size_t(y1) * src.w + x0) * 3 + ch];
                float v11 = src.data[(size_t(y1) * src.w + x1) * 3 + ch];
                dst[(size_t(y) * W + x) * 3 + ch] =
                    (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                    wy * ((1 - wx) * v10 + wx * v11);
            }
        }
    }
}

// OpenCV-model undistortion (k1 k2 p1 p2 k3), bilinear remap.
void undistort(const Image& src, const double* K, const double* D,
               Image* out) {
    out->h = src.h;
    out->w = src.w;
    out->c = 3;
    out->data.assign(src.data.size(), 0.f);
    const double fx = K[0], cx = K[2], fy = K[4], cy = K[5];
    const double k1 = D[0], k2 = D[1], p1 = D[2], p2 = D[3], k3 = D[4];
    for (int y = 0; y < src.h; ++y) {
        for (int x = 0; x < src.w; ++x) {
            double xn = (x - cx) / fx, yn = (y - cy) / fy;
            double r2 = xn * xn + yn * yn;
            double rad = 1 + r2 * (k1 + r2 * (k2 + r2 * k3));
            double xd = xn * rad + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn);
            double yd = yn * rad + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn;
            double sxf = xd * fx + cx, syf = yd * fy + cy;
            int x0 = int(std::floor(sxf)), y0 = int(std::floor(syf));
            if (x0 < 0 || y0 < 0 || x0 >= src.w - 1 || y0 >= src.h - 1)
                continue;
            double wx = sxf - x0, wy = syf - y0;
            for (int ch = 0; ch < 3; ++ch) {
                float v00 = src.data[(size_t(y0) * src.w + x0) * 3 + ch];
                float v01 = src.data[(size_t(y0) * src.w + x0 + 1) * 3 + ch];
                float v10 = src.data[(size_t(y0 + 1) * src.w + x0) * 3 + ch];
                float v11 =
                    src.data[(size_t(y0 + 1) * src.w + x0 + 1) * 3 + ch];
                out->data[(size_t(y) * src.w + x) * 3 + ch] =
                    float((1 - wy) * ((1 - wx) * v00 + wx * v01) +
                          wy * ((1 - wx) * v10 + wx * v11));
            }
        }
    }
}

struct Job {
    std::string path;
    int H, W;
    bool has_dist = false;
    double K[9], D[5];
    std::vector<float> out;
    bool ok = false;
    bool done = false;
};

class Pool {
  public:
    explicit Pool(int n) : stop_(false) {
        for (int i = 0; i < n; ++i)
            workers_.emplace_back([this] { run(); });
    }
    ~Pool() {
        {
            std::lock_guard<std::mutex> g(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : workers_) t.join();
    }

    int64_t submit(const char* path, int H, int W, const double* K,
                   const double* D) {
        auto job = std::make_shared<Job>();
        job->path = path;
        job->H = H;
        job->W = W;
        if (K && D) {
            bool nonzero = false;
            for (int i = 0; i < 5; ++i) nonzero |= (D[i] != 0.0);
            if (nonzero) {
                job->has_dist = true;
                memcpy(job->K, K, 9 * sizeof(double));
                memcpy(job->D, D, 5 * sizeof(double));
            }
        }
        int64_t id;
        {
            std::lock_guard<std::mutex> g(mu_);
            id = next_id_++;
            jobs_[id] = job;
            queue_.push_back(id);
        }
        cv_.notify_one();
        return id;
    }

    // Blocks until the job completes; copies HWC float32 into dst.
    int fetch(int64_t id, float* dst) {
        std::shared_ptr<Job> job;
        {
            std::unique_lock<std::mutex> g(mu_);
            auto it = jobs_.find(id);
            if (it == jobs_.end()) return -1;
            job = it->second;
            done_cv_.wait(g, [&] { return job->done; });
            jobs_.erase(id);
        }
        if (!job->ok) return -2;
        memcpy(dst, job->out.data(), job->out.size() * sizeof(float));
        return 0;
    }

  private:
    void run() {
        for (;;) {
            std::shared_ptr<Job> job;
            {
                std::unique_lock<std::mutex> g(mu_);
                cv_.wait(g, [&] { return stop_ || !queue_.empty(); });
                if (stop_) return;
                job = jobs_[queue_.front()];
                queue_.pop_front();
            }
            process(*job);
            {
                std::lock_guard<std::mutex> g(mu_);
                job->done = true;
            }
            done_cv_.notify_all();
        }
    }

    static void process(Job& job) {
        FILE* f = fopen(job.path.c_str(), "rb");
        if (!f) return;
        fseek(f, 0, SEEK_END);
        long len = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(len);
        size_t rd = fread(buf.data(), 1, len, f);
        fclose(f);
        if ((long)rd != len) return;
        Image im;
        if (!decode_any(buf, &im)) return;
        Image und;
        const Image* src = &im;
        if (job.has_dist) {
            undistort(im, job.K, job.D, &und);
            src = &und;
        }
        job.out.resize(size_t(job.H) * job.W * 3);
        resize_bilinear(*src, job.H, job.W, job.out.data());
        job.ok = true;
    }

    std::vector<std::thread> workers_;
    std::mutex mu_;
    std::condition_variable cv_, done_cv_;
    std::deque<int64_t> queue_;
    std::unordered_map<int64_t, std::shared_ptr<Job>> jobs_;
    int64_t next_id_ = 1;
    bool stop_;
};

}  // namespace

extern "C" {

void* loader_create(int n_threads) { return new Pool(n_threads); }
void loader_destroy(void* p) { delete static_cast<Pool*>(p); }

int64_t loader_submit(void* p, const char* path, int H, int W,
                      const double* K, const double* D) {
    return static_cast<Pool*>(p)->submit(path, H, W, K, D);
}

int loader_fetch(void* p, int64_t id, float* dst) {
    return static_cast<Pool*>(p)->fetch(id, dst);
}

// one-shot synchronous decode (convenience / tests)
int loader_decode(void* p, const char* path, int H, int W, const double* K,
                  const double* D, float* dst) {
    auto* pool = static_cast<Pool*>(p);
    return pool->fetch(pool->submit(path, H, W, K, D), dst);
}
}
