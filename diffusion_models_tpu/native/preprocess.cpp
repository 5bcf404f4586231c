// Native image-preprocessing kernel for the host input pipeline.
//
// The reference's data path is PIL + torchvision transforms in Python
// (`train/utils/data.py:33-39`); on a TPU host the Python transform chain is
// frequently the bottleneck feeding the chip. This library does the
// everything-after-decode work — short-side ANTIALIASED bilinear resize
// (PIL-style triangle filter whose support scales with the downscale
// factor), center crop, optional horizontal flip, uint8→f32 [0,1]
// normalize, NHWC batch assembly — in multithreaded C++, called from
// `utils/native_preproc.py` via ctypes (the GIL is released for the call).
//
// Build: native/build.sh → libdmt_preproc.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

// Precomputed separable resampling weights for one axis (PIL-style
// triangle/bilinear filter with antialiasing on downscale).
struct AxisWeights {
    std::vector<int> start;      // first source index per output index
    std::vector<int> count;      // number of taps per output index
    std::vector<float> weights;  // taps, max_taps-strided
    int max_taps = 0;
};

AxisWeights build_weights(int in_size, int out_size) {
    AxisWeights aw;
    const double ss = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(ss, 1.0);
    const double support = filterscale;  // triangle filter support = 1
    aw.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
    aw.start.resize(out_size);
    aw.count.resize(out_size);
    aw.weights.assign(static_cast<size_t>(out_size) * aw.max_taps, 0.0f);

    for (int i = 0; i < out_size; ++i) {
        const double center = (i + 0.5) * ss;
        int xmin = static_cast<int>(std::floor(center - support));
        int xmax = static_cast<int>(std::ceil(center + support));
        xmin = std::max(xmin, 0);
        xmax = std::min(xmax, in_size);
        double total = 0.0;
        std::vector<double> tmp(xmax - xmin);
        for (int x = xmin; x < xmax; ++x) {
            const double t = (x + 0.5 - center) / filterscale;
            const double w = std::max(0.0, 1.0 - std::abs(t));
            tmp[x - xmin] = w;
            total += w;
        }
        if (total <= 0.0) {  // degenerate: nearest
            const int x = std::min(std::max(static_cast<int>(center), 0),
                                   in_size - 1);
            xmin = x;
            tmp.assign(1, 1.0);
            total = 1.0;
            xmax = x + 1;
        }
        aw.start[i] = xmin;
        aw.count[i] = xmax - xmin;
        for (int k = 0; k < xmax - xmin; ++k) {
            aw.weights[static_cast<size_t>(i) * aw.max_taps + k] =
                static_cast<float>(tmp[k] / total);
        }
    }
    return aw;
}

// One image: short-side resize to `target` (rounded long side, like the
// python `resize_and_center_crop`), center-crop target×target, optional
// hflip, normalize to [0,1]; writes target*target*ch floats.
void process_one(const uint8_t* img, int h, int w, int ch,
                 int target, bool flip, float* out) {
    const double scale = static_cast<double>(target) / std::min(h, w);
    const int new_h = std::max(1, static_cast<int>(std::lround(h * scale)));
    const int new_w = std::max(1, static_cast<int>(std::lround(w * scale)));

    const AxisWeights wx = build_weights(w, new_w);
    const AxisWeights wy = build_weights(h, new_h);

    // pass 1: horizontal resample (h, w, ch) -> (h, new_w, ch), f32
    std::vector<float> tmp(static_cast<size_t>(h) * new_w * ch);
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = img + static_cast<size_t>(y) * w * ch;
        float* trow = tmp.data() + static_cast<size_t>(y) * new_w * ch;
        for (int x = 0; x < new_w; ++x) {
            const int s = wx.start[x], n = wx.count[x];
            const float* wgt = &wx.weights[static_cast<size_t>(x) * wx.max_taps];
            for (int c = 0; c < ch; ++c) {
                float acc = 0.0f;
                for (int k = 0; k < n; ++k)
                    acc += wgt[k] * row[(s + k) * ch + c];
                trow[x * ch + c] = acc;
            }
        }
    }

    // crop offsets (integer, PIL crop semantics)
    const int top = (new_h - target) / 2;
    const int left = (new_w - target) / 2;

    // pass 2: vertical resample only for the cropped rows, + crop/flip/scale
    constexpr float kInv255 = 1.0f / 255.0f;
    for (int ty = 0; ty < target; ++ty) {
        const int y = ty + top;
        const int s = wy.start[y], n = wy.count[y];
        const float* wgt = &wy.weights[static_cast<size_t>(y) * wy.max_taps];
        float* orow = out + static_cast<size_t>(ty) * target * ch;
        for (int tx = 0; tx < target; ++tx) {
            const int x = tx + left;
            const int ox = flip ? (target - 1 - tx) : tx;
            for (int c = 0; c < ch; ++c) {
                float acc = 0.0f;
                for (int k = 0; k < n; ++k)
                    acc += wgt[k] *
                           tmp[(static_cast<size_t>(s + k) * new_w + x) * ch + c];
                orow[ox * ch + c] =
                    std::min(std::max(acc * kInv255, 0.0f), 1.0f);
            }
        }
    }
}

}  // namespace

extern "C" {

// images: n pointers to HWC uint8 buffers; dims: n*3 ints (h, w, ch);
// flips: n bytes (0/1); out: n*target*target*ch floats (NHWC batch).
void dmt_preprocess_batch(const uint8_t** images, const int* dims, int n,
                          int target, const uint8_t* flips, float* out,
                          int num_threads) {
    if (num_threads < 1) num_threads = 1;
    const auto worker = [&](int tid) {
        for (int i = tid; i < n; i += num_threads) {
            const int h = dims[i * 3], w = dims[i * 3 + 1],
                      ch = dims[i * 3 + 2];
            process_one(images[i], h, w, ch, target, flips[i] != 0,
                        out + static_cast<int64_t>(i) * target * target * ch);
        }
    };
    if (num_threads == 1) {
        worker(0);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
}

// uint8 HWC → f32 [0,1] copy (vectorizable), for pre-sized images.
void dmt_u8_to_f32(const uint8_t* src, float* dst, int64_t count) {
    constexpr float kInv255 = 1.0f / 255.0f;
    for (int64_t i = 0; i < count; ++i) dst[i] = src[i] * kInv255;
}

}  // extern "C"
