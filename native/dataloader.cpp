// Native data loader: threaded JPEG/PNG decode + downscale pipeline.
//
// TPU-native replacement for the runtime role the reference delegates to
// C++/CUDA extensions (SURVEY.md §2.16): dataset readers decode hundreds of
// frames per scene (scene/dataset_readers.py per-frame imageio/cv2 loop);
// this pipeline keeps the host busy with a worker pool feeding decoded,
// scaled float32 buffers through a bounded queue, so scene loading and
// epoch streaming run at disk/decode speed instead of single-threaded
// Python speed.
//
// C API (ctypes-friendly, no pybind11 dependency):
//   void* dl_create(int n_workers, int queue_capacity);
//   int   dl_submit(void* h, const char* path, long job_id, int half_scale);
//   long  dl_wait(void* h, float** data, int* height, int* width, int* ch);
//   void  dl_release(void* h, long job_id);
//   void  dl_destroy(void* h);
//   int   dl_decode_file(const char* path, int half_scale,
//                        float** data, int* h, int* w, int* c);  // one-shot
//   void  dl_free(float* data);
//
// Build: g++ -O3 -shared -fPIC dataloader.cpp -ljpeg -lpng -lz -lpthread

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
    std::vector<float> data;  // HWC float32 in [0, 1]
    int h = 0, w = 0, c = 0;
    bool ok = false;
};

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg with longjmp error handling)
// ---------------------------------------------------------------------------

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, Image* out) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width, h = cinfo.output_height;
    const int c = cinfo.output_components;
    std::vector<unsigned char> row(static_cast<size_t>(w) * c);
    out->data.resize(static_cast<size_t>(h) * w * c);
    for (int y = 0; y < h; ++y) {
        unsigned char* rp = row.data();
        jpeg_read_scanlines(&cinfo, &rp, 1);
        float* dst = out->data.data() + static_cast<size_t>(y) * w * c;
        for (int i = 0; i < w * c; ++i) dst[i] = row[i] * (1.0f / 255.0f);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    out->h = h;
    out->w = w;
    out->c = c;
    out->ok = true;
    return true;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng, 8-bit gray/rgb/rgba)
// ---------------------------------------------------------------------------

struct PngReadState {
    const unsigned char* data;
    size_t len;
    size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
    PngReadState* st =
        reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
    if (st->pos + count > st->len) {
        png_error(png, "read past end");
        return;
    }
    memcpy(out, st->data + st->pos, count);
    st->pos += count;
}

bool decode_png(const unsigned char* buf, size_t len, Image* out) {
    if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                               nullptr);
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
    PngReadState st{buf, len, 0};
    png_set_read_fn(png, &st, png_read_fn);
    png_read_info(png, info);

    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr,
                 nullptr, nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_read_update_info(png, info);

    const int c = png_get_channels(png, info);
    std::vector<unsigned char> raw(static_cast<size_t>(h) * w * c);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
        rows[y] = raw.data() + static_cast<size_t>(y) * w * c;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);

    out->data.resize(raw.size());
    for (size_t i = 0; i < raw.size(); ++i)
        out->data[i] = raw[i] * (1.0f / 255.0f);
    out->h = static_cast<int>(h);
    out->w = static_cast<int>(w);
    out->c = c;
    out->ok = true;
    return true;
}

// ---------------------------------------------------------------------------
// 2x box downscale (INTER_AREA equivalent for the ratio-0.5 dataset path)
// ---------------------------------------------------------------------------

void half_scale(Image* img) {
    const int H = img->h / 2, W = img->w / 2, C = img->c;
    std::vector<float> out(static_cast<size_t>(H) * W * C);
    for (int y = 0; y < H; ++y) {
        const float* r0 = img->data.data() +
                          static_cast<size_t>(2 * y) * img->w * C;
        const float* r1 = r0 + static_cast<size_t>(img->w) * C;
        float* dst = out.data() + static_cast<size_t>(y) * W * C;
        for (int x = 0; x < W; ++x) {
            for (int ch = 0; ch < C; ++ch) {
                const int i0 = (2 * x) * C + ch;
                const int i1 = (2 * x + 1) * C + ch;
                dst[x * C + ch] =
                    0.25f * (r0[i0] + r0[i1] + r1[i0] + r1[i1]);
            }
        }
    }
    img->data.swap(out);
    img->h = H;
    img->w = W;
}

bool decode_file(const std::string& path, int half, Image* out) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    const long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> buf(size);
    const size_t rd = fread(buf.data(), 1, size, f);
    fclose(f);
    if (rd != static_cast<size_t>(size)) return false;

    bool ok = false;
    if (size >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
        ok = decode_jpeg(buf.data(), size, out);
    else
        ok = decode_png(buf.data(), size, out);
    if (ok && half && out->h >= 2 && out->w >= 2) half_scale(out);
    return ok;
}

// ---------------------------------------------------------------------------
// Threaded pipeline
// ---------------------------------------------------------------------------

struct Job {
    std::string path;
    long id;
    int half;
};

struct Loader {
    std::vector<std::thread> workers;
    std::deque<Job> pending;
    std::deque<std::pair<long, Image*>> done;
    std::map<long, Image*> held;
    std::mutex mu;
    std::condition_variable cv_job, cv_done;
    size_t queue_capacity;
    bool shutdown = false;

    explicit Loader(int n_workers, int cap) : queue_capacity(cap) {
        for (int i = 0; i < n_workers; ++i)
            workers.emplace_back([this] { run(); });
    }

    void run() {
        for (;;) {
            Job job;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_job.wait(lk, [this] {
                    return shutdown ||
                           (!pending.empty() && done.size() < queue_capacity);
                });
                if (shutdown) return;
                job = pending.front();
                pending.pop_front();
            }
            Image* img = new Image();
            decode_file(job.path, job.half, img);
            {
                std::lock_guard<std::mutex> lk(mu);
                done.emplace_back(job.id, img);
            }
            cv_done.notify_one();
        }
    }

    ~Loader() {
        {
            std::lock_guard<std::mutex> lk(mu);
            shutdown = true;
        }
        cv_job.notify_all();
        for (auto& t : workers) t.join();
        for (auto& kv : done) delete kv.second;
        for (auto& kv : held) delete kv.second;
    }
};

}  // namespace

extern "C" {

void* dl_create(int n_workers, int queue_capacity) {
    return new Loader(n_workers > 0 ? n_workers : 1,
                      queue_capacity > 0 ? queue_capacity : 16);
}

int dl_submit(void* h, const char* path, long job_id, int half_scale_flag) {
    Loader* l = static_cast<Loader*>(h);
    {
        std::lock_guard<std::mutex> lk(l->mu);
        l->pending.push_back(Job{path, job_id, half_scale_flag});
    }
    l->cv_job.notify_one();
    return 0;
}

long dl_wait(void* h, float** data, int* height, int* width, int* channels) {
    Loader* l = static_cast<Loader*>(h);
    std::pair<long, Image*> item;
    {
        std::unique_lock<std::mutex> lk(l->mu);
        l->cv_done.wait(lk, [l] { return !l->done.empty(); });
        item = l->done.front();
        l->done.pop_front();
        l->held[item.first] = item.second;
    }
    l->cv_job.notify_all();  // queue slot freed
    Image* img = item.second;
    if (!img->ok) {
        *data = nullptr;
        *height = *width = *channels = 0;
        return -item.first - 1;  // negative-encoded failure
    }
    *data = img->data.data();
    *height = img->h;
    *width = img->w;
    *channels = img->c;
    return item.first;
}

void dl_release(void* h, long job_id) {
    Loader* l = static_cast<Loader*>(h);
    std::lock_guard<std::mutex> lk(l->mu);
    auto it = l->held.find(job_id);
    if (it != l->held.end()) {
        delete it->second;
        l->held.erase(it);
    }
}

void dl_destroy(void* h) { delete static_cast<Loader*>(h); }

int dl_decode_file(const char* path, int half, float** data, int* height,
                   int* width, int* channels) {
    Image* img = new Image();
    if (!decode_file(path, half, img) || !img->ok) {
        delete img;
        return -1;
    }
    // transfer ownership of the vector buffer to the caller via heap copy
    const size_t n = img->data.size();
    float* out = static_cast<float*>(malloc(n * sizeof(float)));
    memcpy(out, img->data.data(), n * sizeof(float));
    *data = out;
    *height = img->h;
    *width = img->w;
    *channels = img->c;
    delete img;
    return 0;
}

void dl_free(float* data) { free(data); }

}  // extern "C"
