// Native data loader: multithreaded JPEG/PNG decode into a pinned NHWC
// uint8 batch buffer — the framework's runtime-I/O component (the
// reference's DataLoader(num_workers=N) equivalent, SURVEY.md §2.11).
//
// Exposed C ABI (consumed via ctypes from pipeline/native_io.py):
//   itt_decode_batch(paths, n, out, H, W, n_threads) -> 0 on success
//     - decodes each file (JPEG via libjpeg, PNG via libpng), converts to
//       RGB, bilinearly resizes to (H, W), writes into out[n][H][W][3].
//   itt_image_size(path, &w, &h) -> 0 on success (header-only probe)
//
// Build: native/build.sh (g++ -O2 -shared -fPIC, links -ljpeg -lpng).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// decode a JPEG file into an RGB buffer; returns {w, h} or {0, 0} on error
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    rgb.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

bool decode_png(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t header[8];
    if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
        fclose(f);
        return false;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return false;
    }
    png_init_io(png, f);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    w = png_get_image_width(png, info);
    h = png_get_image_height(png, info);
    // normalize to 8-bit RGB
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    png_read_update_info(png, info);
    rgb.resize(static_cast<size_t>(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
        rows[y] = rgb.data() + static_cast<size_t>(y) * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return true;
}

bool has_suffix(const std::string& s, const char* suf) {
    size_t n = strlen(suf);
    if (s.size() < n) return false;
    for (size_t i = 0; i < n; i++) {
        char a = s[s.size() - n + i];
        if (a >= 'A' && a <= 'Z') a += 32;
        if (a != suf[i]) return false;
    }
    return true;
}

bool decode_any(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
    std::string p(path);
    if (has_suffix(p, ".png")) return decode_png(path, rgb, w, h);
    return decode_jpeg(path, rgb, w, h);
}

// bilinear resize RGB (src w0 x h0) -> dst (W x H), half-pixel centers
void resize_bilinear(const uint8_t* src, int w0, int h0, uint8_t* dst, int W, int H) {
    if (w0 == W && h0 == H) {
        memcpy(dst, src, static_cast<size_t>(W) * H * 3);
        return;
    }
    const float sx = static_cast<float>(w0) / W;
    const float sy = static_cast<float>(h0) / H;
    for (int y = 0; y < H; y++) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = fy < 0 ? 0 : static_cast<int>(fy);
        int y1 = y0 + 1 < h0 ? y0 + 1 : h0 - 1;
        float wy = fy - y0;
        if (wy < 0) wy = 0;
        for (int x = 0; x < W; x++) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = fx < 0 ? 0 : static_cast<int>(fx);
            int x1 = x0 + 1 < w0 ? x0 + 1 : w0 - 1;
            float wx = fx - x0;
            if (wx < 0) wx = 0;
            for (int c = 0; c < 3; c++) {
                float a = src[(static_cast<size_t>(y0) * w0 + x0) * 3 + c];
                float b = src[(static_cast<size_t>(y0) * w0 + x1) * 3 + c];
                float d = src[(static_cast<size_t>(y1) * w0 + x0) * 3 + c];
                float e = src[(static_cast<size_t>(y1) * w0 + x1) * 3 + c];
                float top = a + wx * (b - a);
                float bot = d + wx * (e - d);
                dst[(static_cast<size_t>(y) * W + x) * 3 + c] =
                    static_cast<uint8_t>(top + wy * (bot - top) + 0.5f);
            }
        }
    }
}

}  // namespace

extern "C" {

// decode n files into out[n][H][W][3]; returns count of failures
int itt_decode_batch(const char** paths, int n, uint8_t* out, int H, int W,
                     int n_threads) {
    std::atomic<int> next(0), failures(0);
    const size_t img_bytes = static_cast<size_t>(H) * W * 3;
    auto worker = [&]() {
        std::vector<uint8_t> rgb;
        int w0, h0;
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (decode_any(paths[i], rgb, w0, h0)) {
                resize_bilinear(rgb.data(), w0, h0, out + i * img_bytes, W, H);
            } else {
                memset(out + i * img_bytes, 0, img_bytes);
                failures.fetch_add(1);
            }
        }
    };
    int t = n_threads > 0 ? n_threads : 1;
    if (t == 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        for (int i = 0; i < t; i++) threads.emplace_back(worker);
        for (auto& th : threads) th.join();
    }
    return failures.load();
}

int itt_image_size(const char* path, int* w, int* h) {
    std::vector<uint8_t> rgb;
    // header-only would be faster; full decode keeps the code simple and the
    // probe is rarely used
    return decode_any(path, rgb, *w, *h) ? 0 : 1;
}

// encode n NHWC uint8 RGB images (imgs[n][H][W][3]) as JPEG files at the
// given paths (quality 1-100; PIL's default is 75); returns failure count
int itt_encode_batch(const char** paths, int n, const uint8_t* imgs, int H,
                     int W, int quality, int n_threads) {
    std::atomic<int> next(0), failures(0);
    const size_t img_bytes = static_cast<size_t>(H) * W * 3;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            FILE* f = fopen(paths[i], "wb");
            if (!f) { failures.fetch_add(1); continue; }
            jpeg_compress_struct cinfo;
            JpegErrorMgr jerr;
            cinfo.err = jpeg_std_error(&jerr.pub);
            jerr.pub.error_exit = jpeg_error_exit;
            if (setjmp(jerr.setjmp_buffer)) {
                jpeg_destroy_compress(&cinfo);
                fclose(f);
                failures.fetch_add(1);
                continue;
            }
            jpeg_create_compress(&cinfo);
            jpeg_stdio_dest(&cinfo, f);
            cinfo.image_width = W;
            cinfo.image_height = H;
            cinfo.input_components = 3;
            cinfo.in_color_space = JCS_RGB;
            jpeg_set_defaults(&cinfo);
            jpeg_set_quality(&cinfo, quality, TRUE);
            jpeg_start_compress(&cinfo, TRUE);
            const uint8_t* img = imgs + i * img_bytes;
            while (cinfo.next_scanline < cinfo.image_height) {
                JSAMPROW row = const_cast<uint8_t*>(
                    img + static_cast<size_t>(cinfo.next_scanline) * W * 3);
                jpeg_write_scanlines(&cinfo, &row, 1);
            }
            jpeg_finish_compress(&cinfo);
            jpeg_destroy_compress(&cinfo);
            fclose(f);
        }
    };
    int t = n_threads > 0 ? n_threads : 1;
    if (t == 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        for (int i = 0; i < t; i++) threads.emplace_back(worker);
        for (auto& th : threads) th.join();
    }
    return failures.load();
}

}  // extern "C"
