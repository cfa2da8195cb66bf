// Native Radiance .hdr RLE codec.
//
// The host-side data path of this framework is pure numpy except for this
// decoder: adaptive-RLE scanline decoding is inherently sequential byte
// twiddling, and the single host core makes the python loop the dominant
// cost when loading 2k x 4k probes (the reference's host-side hot paths were
// likewise native, e.g. the NVRTC/OptiX wrapper).  Exposed via ctypes (no
// pybind11 dependency); see native.py for the loader and the pure-python
// fallback.
//
// Build: g++ -O2 -shared -fPIC -o libhdr_codec.so hdr_codec.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// Decode `height` scanlines of Radiance RGBE data (adaptive RLE or flat)
// from `payload` (size `payload_len`) into `out` (height*width*4 bytes).
// Returns 0 on success, negative error codes on malformed input.
int hdr_decode_scanlines(const uint8_t* payload, int64_t payload_len,
                         int height, int width, uint8_t* out) {
    int64_t p = 0;
    for (int y = 0; y < height; ++y) {
        uint8_t* row = out + (int64_t)y * width * 4;
        if (p + 4 > payload_len) return -1;
        bool adaptive = payload[p] == 2 && payload[p + 1] == 2 &&
                        ((int)payload[p + 2] << 8 | payload[p + 3]) == width;
        if (adaptive) {
            p += 4;
            for (int c = 0; c < 4; ++c) {
                int x = 0;
                while (x < width) {
                    if (p >= payload_len) return -2;
                    int cnt = payload[p++];
                    if (cnt > 128) {  // run
                        cnt -= 128;
                        if (p >= payload_len || x + cnt > width) return -3;
                        uint8_t v = payload[p++];
                        for (int k = 0; k < cnt; ++k)
                            row[(int64_t)(x + k) * 4 + c] = v;
                        x += cnt;
                    } else {          // literal
                        if (p + cnt > payload_len || x + cnt > width)
                            return -4;
                        for (int k = 0; k < cnt; ++k)
                            row[(int64_t)(x + k) * 4 + c] = payload[p + k];
                        p += cnt;
                        x += cnt;
                    }
                }
            }
        } else {
            if (p + (int64_t)width * 4 > payload_len) return -5;
            std::memcpy(row, payload + p, (size_t)width * 4);
            p += (int64_t)width * 4;
        }
    }
    return 0;
}

// Encode `height` scanlines into adaptive-RLE format.  `out` must have
// capacity for the worst case (height * (4 + width * 4 * 2) bytes).
// Returns the number of bytes written, or negative on error.
int64_t hdr_encode_scanlines(const uint8_t* rgbe, int height, int width,
                             uint8_t* out) {
    if (width < 8 || width > 32767) return -1;  // RLE not representable
    int64_t p = 0;
    for (int y = 0; y < height; ++y) {
        const uint8_t* row = rgbe + (int64_t)y * width * 4;
        out[p++] = 2;
        out[p++] = 2;
        out[p++] = (uint8_t)(width >> 8);
        out[p++] = (uint8_t)(width & 0xFF);
        for (int c = 0; c < 4; ++c) {
            int x = 0;
            while (x < width) {
                // find run length at x
                int run = 1;
                while (x + run < width && run < 127 &&
                       row[(int64_t)(x + run) * 4 + c] ==
                           row[(int64_t)x * 4 + c])
                    ++run;
                if (run >= 4) {
                    out[p++] = (uint8_t)(128 + run);
                    out[p++] = row[(int64_t)x * 4 + c];
                    x += run;
                } else {
                    // literal until next run of >= 4 (max 128)
                    int lit = 0;
                    int xx = x;
                    while (xx < width && lit < 128) {
                        int r = 1;
                        while (xx + r < width && r < 4 &&
                               row[(int64_t)(xx + r) * 4 + c] ==
                                   row[(int64_t)xx * 4 + c])
                            ++r;
                        if (r >= 4) break;
                        ++xx;
                        ++lit;
                    }
                    out[p++] = (uint8_t)lit;
                    for (int k = 0; k < lit; ++k)
                        out[p++] = row[(int64_t)(x + k) * 4 + c];
                    x += lit;
                }
            }
        }
    }
    return p;
}

}  // extern "C"
