// Native COLMAP binary parsers + Gaussian PLY I/O for tpugs.
//
// The reference implements its data layer in C++ (src/data/colmap_loader.cpp,
// src/utils/ply_io.cpp); this is the TPU build's native equivalent, exposed
// through a plain C ABI consumed via ctypes (tpugs/data/native.py). The
// Python loaders remain as the portable fallback and as the test oracle.
//
// Build: native/build.sh  ->  native/libtpugs_native.so
//
// All parsers read the whole file into memory once and walk it with bounds
// checks; outputs are malloc'd buffers the caller frees with tpugs_free().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    template <typename T>
    T get() {
        if (p + sizeof(T) > end) { ok = false; return T{}; }
        T v;
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        return v;
    }
    bool skip(int64_t n) {
        if (p + n > end) { ok = false; return false; }
        p += n;
        return true;
    }
    // Advance past a NUL-terminated string; returns (start, len) via refs.
    bool get_cstr(const char** s, int64_t* len) {
        const uint8_t* q = p;
        while (q < end && *q != 0) ++q;
        if (q >= end) { ok = false; return false; }
        *s = reinterpret_cast<const char*>(p);
        *len = q - p;
        p = q + 1;
        return true;
    }
};

uint8_t* read_file(const char* path, int64_t* size) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n < 0) { std::fclose(f); return nullptr; }
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(n ? n : 1));
    if (buf && std::fread(buf, 1, n, f) != static_cast<size_t>(n)) {
        std::free(buf);
        buf = nullptr;
    }
    std::fclose(f);
    *size = n;
    return buf;
}

int num_params_for_model(int model_id) {
    switch (model_id) {
        case 0: return 3;  // SIMPLE_PINHOLE
        case 1: return 4;  // PINHOLE
        case 2: return 4;  // SIMPLE_RADIAL
        case 3: return 5;  // RADIAL
        case 4: return 8;  // OPENCV
        default: return -1;
    }
}

}  // namespace

extern "C" {

void tpugs_free(void* p) { std::free(p); }

// points3D.bin -> n; *xyz_out = f64[n*3], *rgb_out = u8[n*3]. Tracks skipped
// (reference behavior: colmap_loader.cpp:131-177). Returns -1 on error.
int64_t tpugs_parse_points3d(const char* path, double** xyz_out,
                             uint8_t** rgb_out) {
    int64_t size = 0;
    uint8_t* buf = read_file(path, &size);
    if (!buf) return -1;
    Reader r{buf, buf + size};

    const uint64_t n = r.get<uint64_t>();
    double* xyz = static_cast<double*>(std::malloc(n * 3 * sizeof(double) + 1));
    uint8_t* rgb = static_cast<uint8_t*>(std::malloc(n * 3 + 1));
    if (!xyz || !rgb) {
        std::free(xyz); std::free(rgb); std::free(buf);
        return -1;
    }
    for (uint64_t i = 0; i < n && r.ok; ++i) {
        r.skip(8);  // point3D_id
        xyz[i * 3 + 0] = r.get<double>();
        xyz[i * 3 + 1] = r.get<double>();
        xyz[i * 3 + 2] = r.get<double>();
        rgb[i * 3 + 0] = r.get<uint8_t>();
        rgb[i * 3 + 1] = r.get<uint8_t>();
        rgb[i * 3 + 2] = r.get<uint8_t>();
        r.skip(8);  // reprojection error
        const uint64_t track = r.get<uint64_t>();
        r.skip(static_cast<int64_t>(track) * 8);
    }
    std::free(buf);
    if (!r.ok) {
        std::free(xyz); std::free(rgb);
        return -1;
    }
    *xyz_out = xyz;
    *rgb_out = rgb;
    return static_cast<int64_t>(n);
}

// cameras.bin -> n; *rec_out = f64[n*12]: camera_id, model_id, width, height,
// params[8] (zero-padded). Returns -1 on error.
int64_t tpugs_parse_cameras(const char* path, double** rec_out) {
    int64_t size = 0;
    uint8_t* buf = read_file(path, &size);
    if (!buf) return -1;
    Reader r{buf, buf + size};

    const uint64_t n = r.get<uint64_t>();
    double* rec = static_cast<double*>(std::calloc(n * 12 + 1, sizeof(double)));
    if (!rec) { std::free(buf); return -1; }
    for (uint64_t i = 0; i < n && r.ok; ++i) {
        const int32_t cam_id = r.get<int32_t>();
        const int32_t model_id = r.get<int32_t>();
        const uint64_t w = r.get<uint64_t>();
        const uint64_t h = r.get<uint64_t>();
        const int np = num_params_for_model(model_id);
        if (np < 0) { r.ok = false; break; }
        rec[i * 12 + 0] = cam_id;
        rec[i * 12 + 1] = model_id;
        rec[i * 12 + 2] = static_cast<double>(w);
        rec[i * 12 + 3] = static_cast<double>(h);
        for (int k = 0; k < np; ++k) rec[i * 12 + 4 + k] = r.get<double>();
    }
    std::free(buf);
    if (!r.ok) { std::free(rec); return -1; }
    *rec_out = rec;
    return static_cast<int64_t>(n);
}

// images.bin -> n; *rec_out = f64[n*9]: image_id, qw qx qy qz, tx ty tz,
// camera_id; *names_out = '\n'-joined image names (NUL-terminated blob).
// 2D observations skipped (reference: colmap_loader.cpp:79-125).
int64_t tpugs_parse_images(const char* path, double** rec_out,
                           char** names_out) {
    int64_t size = 0;
    uint8_t* buf = read_file(path, &size);
    if (!buf) return -1;
    Reader r{buf, buf + size};

    const uint64_t n = r.get<uint64_t>();
    double* rec = static_cast<double*>(std::malloc(n * 9 * sizeof(double) + 1));
    char* names = static_cast<char*>(std::malloc(size + 1));  // upper bound
    int64_t names_len = 0;
    if (!rec || !names) {
        std::free(rec); std::free(names); std::free(buf);
        return -1;
    }
    for (uint64_t i = 0; i < n && r.ok; ++i) {
        rec[i * 9 + 0] = r.get<int32_t>();  // image_id
        for (int k = 0; k < 4; ++k) rec[i * 9 + 1 + k] = r.get<double>();
        for (int k = 0; k < 3; ++k) rec[i * 9 + 5 + k] = r.get<double>();
        rec[i * 9 + 8] = r.get<int32_t>();  // camera_id
        const char* s;
        int64_t len;
        if (!r.get_cstr(&s, &len)) break;
        std::memcpy(names + names_len, s, len);
        names_len += len;
        names[names_len++] = '\n';
        const uint64_t np2d = r.get<uint64_t>();
        r.skip(static_cast<int64_t>(np2d) * 24);
    }
    std::free(buf);
    if (!r.ok) { std::free(rec); std::free(names); return -1; }
    names[names_len] = 0;
    *rec_out = rec;
    *names_out = names;
    return static_cast<int64_t>(n);
}

// Gaussian PLY writer, byte-compatible with the reference format
// (reference: ply_io.cpp:98-196). sh is [n, 3, c] row-major. Returns 0 on ok.
int tpugs_write_gaussian_ply(const char* path, int64_t n, int c,
                             const float* means, const float* sh,
                             const float* opacity, const float* scales,
                             const float* quats) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    const int num_rest = 3 * (c - 1);
    std::fprintf(f,
                 "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property float nx\nproperty float ny\nproperty float nz\n",
                 static_cast<long long>(n));
    for (int i = 0; i < 3; ++i) std::fprintf(f, "property float f_dc_%d\n", i);
    for (int i = 0; i < num_rest; ++i)
        std::fprintf(f, "property float f_rest_%d\n", i);
    std::fprintf(f,
                 "property float opacity\nproperty float scale_0\n"
                 "property float scale_1\nproperty float scale_2\n"
                 "property float rot_0\nproperty float rot_1\n"
                 "property float rot_2\nproperty float rot_3\nend_header\n");

    const int row_floats = 3 + 3 + 3 + num_rest + 1 + 3 + 4;
    float* row = static_cast<float*>(std::malloc(row_floats * sizeof(float)));
    if (!row) { std::fclose(f); return -1; }
    for (int64_t i = 0; i < n; ++i) {
        int k = 0;
        for (int j = 0; j < 3; ++j) row[k++] = means[i * 3 + j];
        for (int j = 0; j < 3; ++j) row[k++] = 0.0f;  // normals
        for (int ch = 0; ch < 3; ++ch) row[k++] = sh[(i * 3 + ch) * c + 0];
        for (int co = 1; co < c; ++co)
            for (int ch = 0; ch < 3; ++ch) row[k++] = sh[(i * 3 + ch) * c + co];
        row[k++] = opacity[i];
        for (int j = 0; j < 3; ++j) row[k++] = scales[i * 3 + j];
        for (int j = 0; j < 4; ++j) row[k++] = quats[i * 4 + j];
        if (std::fwrite(row, sizeof(float), row_floats, f) !=
            static_cast<size_t>(row_floats)) {
            std::free(row); std::fclose(f); return -1;
        }
    }
    std::free(row);
    std::fclose(f);
    return 0;
}

}  // extern "C"
