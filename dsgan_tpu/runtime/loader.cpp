// Native data-loading runtime for dsgan_tpu.
//
// Threaded JPEG/PNG decode + crop + horizontal flip + [-1,1] float32
// normalize, assembling device-ready NHWC batches in one pass — the
// native equivalent of the reference's torch DataLoader worker pool
// (reference DSGAN/data/__init__.py:40-45, nThreads=4). Exposed to
// Python via ctypes (dsgan_tpu/runtime/__init__.py); the Python/PIL
// loader remains the portable fallback.
//
// Build: make -C dsgan_tpu/runtime   (g++ + libjpeg + libpng, no other deps)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
    int w = 0, h = 0;
    std::vector<uint8_t> rgb;  // HWC, 3 channels
};

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
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
    out->rgb.resize(size_t(out->w) * out->h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_png(FILE* f, Image* out) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

    // normalize to 8-bit RGB
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    png_read_update_info(png, info);

    out->w = int(w);
    out->h = int(h);
    out->rgb.resize(size_t(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 i = 0; i < h; i++) rows[i] = out->rgb.data() + size_t(i) * w * 3;
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_file(const char* path, Image* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    size_t n = fread(magic, 1, 8, f);
    fseek(f, 0, SEEK_SET);
    bool ok = false;
    if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
        ok = decode_png(f, out);
    } else if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, out);
    }
    fclose(f);
    return ok;
}

// crop (oy, ox, ch, cw) then optional hflip, normalize to [-1,1] float32
// NHWC into dst (ch*cw*3 floats). Out-of-range crop rows/cols clamp to edge.
void postprocess(const Image& im, int oy, int ox, int ch, int cw, int flip, float* dst) {
    const float inv = 2.0f / 255.0f;
    for (int y = 0; y < ch; y++) {
        int sy = oy + y;
        if (sy < 0) sy = 0;
        if (sy >= im.h) sy = im.h - 1;
        const uint8_t* srow = im.rgb.data() + size_t(sy) * im.w * 3;
        float* drow = dst + size_t(y) * cw * 3;
        for (int x = 0; x < cw; x++) {
            int sx = ox + (flip ? (cw - 1 - x) : x);
            if (sx < 0) sx = 0;
            if (sx >= im.w) sx = im.w - 1;
            const uint8_t* p = srow + size_t(sx) * 3;
            float* q = drow + size_t(x) * 3;
            q[0] = p[0] * inv - 1.0f;
            q[1] = p[1] * inv - 1.0f;
            q[2] = p[2] * inv - 1.0f;
        }
    }
}

// uint8 variant: crop+flip only — the [-1,1] normalize runs on the
// accelerator (quarter of the host->device bytes; see data/transforms.py)
void postprocess_u8(const Image& im, int oy, int ox, int ch, int cw, int flip,
                    uint8_t* dst) {
    for (int y = 0; y < ch; y++) {
        int sy = oy + y;
        if (sy < 0) sy = 0;
        if (sy >= im.h) sy = im.h - 1;
        const uint8_t* srow = im.rgb.data() + size_t(sy) * im.w * 3;
        uint8_t* drow = dst + size_t(y) * cw * 3;
        for (int x = 0; x < cw; x++) {
            int sx = ox + (flip ? (cw - 1 - x) : x);
            if (sx < 0) sx = 0;
            if (sx >= im.w) sx = im.w - 1;
            const uint8_t* p = srow + size_t(sx) * 3;
            uint8_t* q = drow + size_t(x) * 3;
            q[0] = p[0];
            q[1] = p[1];
            q[2] = p[2];
        }
    }
}

}  // namespace

extern "C" {

// Decode + crop + flip + normalize a batch of n images into out
// (n, crop_h, crop_w, 3) float32. offs_y/offs_x/flips are per-image.
// Returns the number of successfully decoded images (failures leave
// zeros in their slot).
int dsgan_load_batch(const char** paths, int n, const int* offs_y, const int* offs_x,
                     const int* flips, int crop_h, int crop_w, int num_threads,
                     float* out) {
    if (num_threads < 1) num_threads = 1;
    std::vector<int> ok(n, 0);
    const size_t stride = size_t(crop_h) * crop_w * 3;

    auto work = [&](int t) {
        for (int i = t; i < n; i += num_threads) {
            Image im;
            float* dst = out + size_t(i) * stride;
            if (decode_file(paths[i], &im)) {
                postprocess(im, offs_y[i], offs_x[i], crop_h, crop_w, flips[i], dst);
                ok[i] = 1;
            } else {
                memset(dst, 0, stride * sizeof(float));
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
    int total = 0;
    for (int v : ok) total += v;
    return total;
}

// uint8 batch: decode + crop + flip, normalize deferred to the device.
int dsgan_load_batch_u8(const char** paths, int n, const int* offs_y,
                        const int* offs_x, const int* flips, int crop_h,
                        int crop_w, int num_threads, uint8_t* out) {
    if (num_threads < 1) num_threads = 1;
    std::vector<int> ok(n, 0);
    const size_t stride = size_t(crop_h) * crop_w * 3;

    auto work = [&](int t) {
        for (int i = t; i < n; i += num_threads) {
            Image im;
            uint8_t* dst = out + size_t(i) * stride;
            if (decode_file(paths[i], &im)) {
                postprocess_u8(im, offs_y[i], offs_x[i], crop_h, crop_w, flips[i], dst);
                ok[i] = 1;
            } else {
                memset(dst, 0, stride);
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
    int total = 0;
    for (int v : ok) total += v;
    return total;
}

// Probe: decode one image header-only (returns 1 on success, fills w/h).
int dsgan_probe(const char* path, int* w, int* h) {
    Image im;
    if (!decode_file(path, &im)) return 0;
    *w = im.w;
    *h = im.h;
    return 1;
}

}  // extern "C"
