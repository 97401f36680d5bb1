// gen6d_native: host-side runtime library for the data path.
//
// The reference leaned on native code via cv2 (C++ warps) and torch DataLoader
// worker processes (dataset/train_dataset.py, train/trainer.py:38-42). This
// library is the TPU build's equivalent host runtime: libjpeg/libpng decode,
// bilinear warps with cv2 conventions, and a pthread image loader that
// overlaps disk IO + decode with TPU compute.
//
// C ABI, consumed from Python via ctypes (gen6d_tpu/utils/native.py).
// Build: make -C native
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <pthread.h>
#include <vector>
#include <string>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

extern "C" {

// ---------------------------------------------------------------- JPEG decode
struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

// Decode a JPEG file into an RGB uint8 buffer. Returns 0 on success and fills
// *out_h/*out_w; the caller provides a buffer of capacity cap_h*cap_w*3.
int decode_jpeg(const char* path, uint8_t* out, int cap_h, int cap_w,
                int* out_h, int* out_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    int h = cinfo.output_height, w = cinfo.output_width;
    if (h > cap_h || w > cap_w) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    while ((int)cinfo.output_scanline < h) {
        uint8_t* row = out + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *out_h = h;
    *out_w = w;
    return 0;
}

// ----------------------------------------------------------------- PNG decode
// Decode a PNG into RGBA (masks use any channel); returns 0 on success.
int decode_png(const char* path, uint8_t* out, int cap_h, int cap_w,
               int* out_h, int* out_w, int* out_c) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    int c = png_get_channels(png, info);
    if (h > cap_h || w > cap_w || c > 4) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -3;
    }
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++) rows[y] = out + (size_t)y * w * c;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *out_h = h;
    *out_w = w;
    *out_c = c;
    return 0;
}

// -------------------------------------------------------------- bilinear warp
// cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) semantics:
// dst(x,y) = src(inv(M) @ (x,y,1)). M is the FORWARD 2x3 affine.
void warp_affine_u8(const uint8_t* src, int sh, int sw, int c,
                    const float* M, uint8_t* dst, int dh, int dw) {
    // invert the forward affine
    float a = M[0], b = M[1], tx = M[2], d = M[3], e = M[4], ty = M[5];
    float det = a * e - b * d;
    if (fabsf(det) < 1e-12f) det = 1e-12f;
    float ia = e / det, ib = -b / det, id = -d / det, ie = a / det;
    float itx = -(ia * tx + ib * ty), ity = -(id * tx + ie * ty);
    for (int y = 0; y < dh; y++) {
        for (int x = 0; x < dw; x++) {
            float sx = ia * x + ib * y + itx;
            float sy = id * x + ie * y + ity;
            int x0 = (int)floorf(sx), y0 = (int)floorf(sy);
            float wx = sx - x0, wy = sy - y0;
            uint8_t* o = dst + ((size_t)y * dw + x) * c;
            for (int ch = 0; ch < c; ch++) {
                float acc = 0.f;
                for (int dy2 = 0; dy2 < 2; dy2++) {
                    int yy = y0 + dy2;
                    if (yy < 0 || yy >= sh) continue;
                    float wgy = dy2 ? wy : 1.f - wy;
                    for (int dx2 = 0; dx2 < 2; dx2++) {
                        int xx = x0 + dx2;
                        if (xx < 0 || xx >= sw) continue;
                        float wgx = dx2 ? wx : 1.f - wx;
                        acc += wgy * wgx * src[((size_t)yy * sw + xx) * c + ch];
                    }
                }
                o[ch] = (uint8_t)(acc + 0.5f);
            }
        }
    }
}

// cv2.warpPerspective equivalent; H is the forward 3x3 homography.
void warp_perspective_u8(const uint8_t* src, int sh, int sw, int c,
                         const float* H, uint8_t* dst, int dh, int dw) {
    // invert H (adjugate / det)
    double m[9];
    for (int i = 0; i < 9; i++) m[i] = H[i];
    double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                 m[1] * (m[3] * m[8] - m[5] * m[6]) +
                 m[2] * (m[3] * m[7] - m[4] * m[6]);
    if (fabs(det) < 1e-14) det = 1e-14;
    double inv[9] = {
        (m[4] * m[8] - m[5] * m[7]) / det, (m[2] * m[7] - m[1] * m[8]) / det,
        (m[1] * m[5] - m[2] * m[4]) / det, (m[5] * m[6] - m[3] * m[8]) / det,
        (m[0] * m[8] - m[2] * m[6]) / det, (m[2] * m[3] - m[0] * m[5]) / det,
        (m[3] * m[7] - m[4] * m[6]) / det, (m[1] * m[6] - m[0] * m[7]) / det,
        (m[0] * m[4] - m[1] * m[3]) / det};
    for (int y = 0; y < dh; y++) {
        for (int x = 0; x < dw; x++) {
            double sz = inv[6] * x + inv[7] * y + inv[8];
            if (fabs(sz) < 1e-12) sz = 1e-12;
            float sx = (float)((inv[0] * x + inv[1] * y + inv[2]) / sz);
            float sy = (float)((inv[3] * x + inv[4] * y + inv[5]) / sz);
            int x0 = (int)floorf(sx), y0 = (int)floorf(sy);
            float wx = sx - x0, wy = sy - y0;
            uint8_t* o = dst + ((size_t)y * dw + x) * c;
            for (int ch = 0; ch < c; ch++) {
                float acc = 0.f;
                for (int dy2 = 0; dy2 < 2; dy2++) {
                    int yy = y0 + dy2;
                    if (yy < 0 || yy >= sh) continue;
                    float wgy = dy2 ? wy : 1.f - wy;
                    for (int dx2 = 0; dx2 < 2; dx2++) {
                        int xx = x0 + dx2;
                        if (xx < 0 || xx >= sw) continue;
                        float wgx = dx2 ? wx : 1.f - wx;
                        acc += wgy * wgx * src[((size_t)yy * sw + xx) * c + ch];
                    }
                }
                o[ch] = (uint8_t)(acc + 0.5f);
            }
        }
    }
}

// ---------------------------------------------------- parallel batch loading
struct LoadJob {
    const char* path;
    uint8_t* out;
    int cap_h, cap_w;
    int* out_h;
    int* out_w;
    int status;
};

struct LoadCtx {
    LoadJob* jobs;
    int n;
    int next;
    pthread_mutex_t mu;
};

static void* load_worker(void* arg) {
    LoadCtx* ctx = (LoadCtx*)arg;
    while (true) {
        pthread_mutex_lock(&ctx->mu);
        int i = ctx->next++;
        pthread_mutex_unlock(&ctx->mu);
        if (i >= ctx->n) break;
        LoadJob& j = ctx->jobs[i];
        j.status = decode_jpeg(j.path, j.out, j.cap_h, j.cap_w, j.out_h,
                               j.out_w);
    }
    return nullptr;
}

// Decode n JPEGs in parallel with `threads` workers into a packed buffer of
// stride cap_h*cap_w*3. Returns number of failures.
int load_jpeg_batch(const char** paths, int n, uint8_t* out, int cap_h,
                    int cap_w, int* hs, int* ws, int threads) {
    std::vector<LoadJob> jobs(n);
    for (int i = 0; i < n; i++) {
        jobs[i] = {paths[i], out + (size_t)i * cap_h * cap_w * 3, cap_h, cap_w,
                   hs + i, ws + i, 0};
    }
    LoadCtx ctx = {jobs.data(), n, 0, PTHREAD_MUTEX_INITIALIZER};
    if (threads < 1) threads = 1;
    std::vector<pthread_t> ts(threads);
    for (int t = 0; t < threads; t++)
        pthread_create(&ts[t], nullptr, load_worker, &ctx);
    int fails = 0;
    for (int t = 0; t < threads; t++) pthread_join(ts[t], nullptr);
    for (int i = 0; i < n; i++)
        if (jobs[i].status != 0) fails++;
    return fails;
}

}  // extern "C"
