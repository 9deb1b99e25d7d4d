// tpu-fuser: native depth-map fusion CLI (the fusibile-role equivalent).
//
// Re-implements the behavior of the reference's CUDA fusibile binary
// (reference gipuma/fusibile/fusibile.cu, main.cpp) for CPU+OpenMP, with the
// fork's 8-bit alpha-channel depth decoding replaced by float PFM inputs
// (upstream intent; SURVEY.md provenance caveat):
//
//   for every reference view pixel with depth d:
//     unproject to a world point X
//     for every other view: project X, bilinearly sample that view's depth,
//       convert both to disparity (f·baseline/depth) and call the views
//       consistent when |Δdisp| < disp_threshold (default 0.25)
//     if ≥ num_consistent views agree, emit the averaged 3D point + color.
//
// Inputs per scan folder: depth_est/NNNNNNNN.pfm, cams/NNNNNNNN_cam.txt
// (MVSNet format: extrinsic 4x4, intrinsic 3x3), images/NNNNNNNN.ppm
// (optional; points are colorless without it — the Python driver
// fusion/native.ensure_ppm_images converts the pipeline's JPEGs),
// pair.txt. Output: one binary PLY.
//
// Usage: tpu_fuser <scan_folder> <out.ply> [--disp_threshold 0.25]
//        [--num_consistent 3] [--min_depth 0] [--max_depth 1e9]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<float> data;  // h*w (gray) or h*w*3
  int channels = 1;
  float at(int y, int x, int c = 0) const {
    return data[(static_cast<size_t>(y) * w + x) * channels + c];
  }
};

struct Camera {
  // World->cam extrinsics R|t and intrinsics K.
  float R[9], t[3], K[9];
  float C[3];        // camera center -R^T t
  float Kinv[9];
  float fx() const { return K[0]; }
};

bool read_pfm(const std::string& path, Image* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string header;
  f >> header;
  if (header != "Pf" && header != "PF") return false;
  int w, h;
  double scale;
  f >> w >> h >> scale;
  f.get();  // newline
  const int ch = header == "PF" ? 3 : 1;
  std::vector<float> rows(static_cast<size_t>(w) * h * ch);
  f.read(reinterpret_cast<char*>(rows.data()), rows.size() * sizeof(float));
  if (!f) return false;
  if (scale > 0) {  // big-endian file: byte-swap
    for (auto& v : rows) {
      uint32_t u;
      std::memcpy(&u, &v, 4);
      u = __builtin_bswap32(u);
      std::memcpy(&v, &u, 4);
    }
  }
  out->w = w;
  out->h = h;
  out->channels = ch;
  out->data.resize(rows.size());
  // PFM stores bottom-up.
  for (int y = 0; y < h; ++y)
    std::memcpy(&out->data[static_cast<size_t>(y) * w * ch],
                &rows[static_cast<size_t>(h - 1 - y) * w * ch],
                static_cast<size_t>(w) * ch * sizeof(float));
  return true;
}

bool read_ppm(const std::string& path, Image* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string magic;
  f >> magic;
  if (magic != "P6") return false;
  int w, h, maxv;
  f >> w >> h >> maxv;
  f.get();
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * 3);
  f.read(reinterpret_cast<char*>(buf.data()), buf.size());
  out->w = w;
  out->h = h;
  out->channels = 3;
  out->data.resize(buf.size());
  for (size_t i = 0; i < buf.size(); ++i) out->data[i] = buf[i] / 255.0f;
  return true;
}

void invert3(const float m[9], float inv[9]) {
  const float a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], ff = m[5],
              g = m[6], h = m[7], i = m[8];
  const float det =
      a * (e * i - ff * h) - b * (d * i - ff * g) + c * (d * h - e * g);
  const float id = 1.0f / det;
  inv[0] = (e * i - ff * h) * id;
  inv[1] = (c * h - b * i) * id;
  inv[2] = (b * ff - c * e) * id;
  inv[3] = (ff * g - d * i) * id;
  inv[4] = (a * i - c * g) * id;
  inv[5] = (c * d - a * ff) * id;
  inv[6] = (d * h - e * g) * id;
  inv[7] = (b * g - a * h) * id;
  inv[8] = (a * e - b * d) * id;
}

bool read_cam(const std::string& path, Camera* cam) {
  std::ifstream f(path);
  if (!f) return false;
  std::string tok;
  // "extrinsic" then 4x4, then "intrinsic" then 3x3.
  f >> tok;
  if (tok != "extrinsic") return false;
  float E[16];
  for (auto& v : E) f >> v;
  f >> tok;
  if (tok != "intrinsic") return false;
  for (auto& v : cam->K) f >> v;
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) cam->R[r * 3 + c] = E[r * 4 + c];
    cam->t[r] = E[r * 4 + 3];
  }
  // C = -R^T t
  for (int r = 0; r < 3; ++r)
    cam->C[r] = -(cam->R[0 * 3 + r] * cam->t[0] + cam->R[1 * 3 + r] * cam->t[1] +
                  cam->R[2 * 3 + r] * cam->t[2]);
  invert3(cam->K, cam->Kinv);
  return true;
}

struct Vec3 {
  float x, y, z;
};

inline Vec3 unproject(const Camera& cam, float u, float v, float depth) {
  // X_cam = depth * K^-1 [u v 1]; X_world = R^T (X_cam - t)
  const float xc = depth * (cam.Kinv[0] * u + cam.Kinv[1] * v + cam.Kinv[2]);
  const float yc = depth * (cam.Kinv[3] * u + cam.Kinv[4] * v + cam.Kinv[5]);
  const float zc = depth * (cam.Kinv[6] * u + cam.Kinv[7] * v + cam.Kinv[8]);
  const float dx = xc - cam.t[0], dy = yc - cam.t[1], dz = zc - cam.t[2];
  return {cam.R[0] * dx + cam.R[3] * dy + cam.R[6] * dz,
          cam.R[1] * dx + cam.R[4] * dy + cam.R[7] * dz,
          cam.R[2] * dx + cam.R[5] * dy + cam.R[8] * dz};
}

inline bool project(const Camera& cam, const Vec3& X, float* u, float* v,
                    float* depth) {
  const float xc = cam.R[0] * X.x + cam.R[1] * X.y + cam.R[2] * X.z + cam.t[0];
  const float yc = cam.R[3] * X.x + cam.R[4] * X.y + cam.R[5] * X.z + cam.t[1];
  const float zc = cam.R[6] * X.x + cam.R[7] * X.y + cam.R[8] * X.z + cam.t[2];
  if (zc <= 1e-6f) return false;
  const float uu = cam.K[0] * xc + cam.K[1] * yc + cam.K[2] * zc;
  const float vv = cam.K[3] * xc + cam.K[4] * yc + cam.K[5] * zc;
  *u = uu / zc;
  *v = vv / zc;
  *depth = zc;
  return true;
}

inline float sample_bilinear(const Image& img, float x, float y) {
  if (x < 0 || y < 0 || x > img.w - 1 || y > img.h - 1) return 0.0f;
  const int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
  const int x1 = std::min(x0 + 1, img.w - 1), y1 = std::min(y0 + 1, img.h - 1);
  const float wx = x - x0, wy = y - y0;
  return img.at(y0, x0) * (1 - wx) * (1 - wy) + img.at(y0, x1) * wx * (1 - wy) +
         img.at(y1, x0) * (1 - wx) * wy + img.at(y1, x1) * wx * wy;
}

// Baseline length between two camera centers (fusibile's disparity
// conversion uses f*baseline/depth; reference gipuma/fusibile/fusibile.cu:40-47).
inline float baseline(const Camera& a, const Camera& b) {
  const float dx = a.C[0] - b.C[0], dy = a.C[1] - b.C[1], dz = a.C[2] - b.C[2];
  return std::sqrt(dx * dx + dy * dy + dz * dz);
}

struct Point {
  Vec3 p;
  uint8_t r, g, b;
};

std::vector<std::pair<int, std::vector<int>>> read_pairs(
    const std::string& path) {
  std::ifstream f(path);
  std::vector<std::pair<int, std::vector<int>>> out;
  int n;
  if (!(f >> n)) return out;
  for (int i = 0; i < n; ++i) {
    int ref, ns;
    if (!(f >> ref >> ns)) break;
    std::vector<int> srcs;
    for (int s = 0; s < ns; ++s) {
      int id;
      float score;
      f >> id >> score;
      srcs.push_back(id);
    }
    if (!srcs.empty()) out.emplace_back(ref, srcs);
  }
  return out;
}

std::string view_path(const std::string& folder, const std::string& sub,
                      int view, const std::string& suffix) {
  char buf[64];
  std::snprintf(buf, sizeof(buf), "%08d%s", view, suffix.c_str());
  return folder + "/" + sub + "/" + buf;
}

void write_ply(const std::string& path, const std::vector<Point>& pts) {
  std::ofstream f(path, std::ios::binary);
  f << "ply\nformat binary_little_endian 1.0\nelement vertex " << pts.size()
    << "\nproperty float x\nproperty float y\nproperty float z\n"
       "property uchar red\nproperty uchar green\nproperty uchar blue\n"
       "end_header\n";
  for (const auto& pt : pts) {
    f.write(reinterpret_cast<const char*>(&pt.p), 12);
    f.write(reinterpret_cast<const char*>(&pt.r), 1);
    f.write(reinterpret_cast<const char*>(&pt.g), 1);
    f.write(reinterpret_cast<const char*>(&pt.b), 1);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: tpu_fuser <scan_folder> <out.ply> "
                 "[--disp_threshold D] [--num_consistent N] "
                 "[--min_depth D] [--max_depth D]\n");
    return 2;
  }
  const std::string folder = argv[1];
  const std::string out_ply = argv[2];
  float disp_threshold = 0.25f;
  int num_consistent = 3;
  float min_depth = 0.0f, max_depth = 1e9f;
  for (int i = 3; i + 1 < argc; i += 2) {
    const std::string k = argv[i];
    const float v = std::atof(argv[i + 1]);
    if (k == "--disp_threshold") disp_threshold = v;
    else if (k == "--num_consistent") num_consistent = static_cast<int>(v);
    else if (k == "--min_depth") min_depth = v;
    else if (k == "--max_depth") max_depth = v;
  }

  auto pairs = read_pairs(folder + "/pair.txt");
  if (pairs.empty()) {
    std::fprintf(stderr, "no pair.txt in %s\n", folder.c_str());
    return 1;
  }

  // Load all views referenced anywhere.
  int max_view = 0;
  for (auto& [r, s] : pairs) {
    max_view = std::max(max_view, r);
    for (int v : s) max_view = std::max(max_view, v);
  }
  const int n_views = max_view + 1;
  std::vector<Image> depths(n_views);
  std::vector<Image> colors(n_views);
  std::vector<Camera> cams(n_views);
  std::vector<bool> loaded(n_views, false);
  for (int v = 0; v < n_views; ++v) {
    Image d;
    Camera c;
    if (!read_pfm(view_path(folder, "depth_est", v, ".pfm"), &d)) continue;
    if (!read_cam(view_path(folder, "cams", v, "_cam.txt"), &c)) continue;
    read_ppm(view_path(folder, "images", v, ".ppm"), &colors[v]);  // optional
    depths[v] = std::move(d);
    cams[v] = c;
    loaded[v] = true;
  }

  std::vector<std::vector<Point>> per_ref(pairs.size());
#pragma omp parallel for schedule(dynamic)
  for (size_t pi = 0; pi < pairs.size(); ++pi) {
    const int ref = pairs[pi].first;
    if (!loaded[ref]) continue;
    const auto& srcs = pairs[pi].second;
    const Image& dref = depths[ref];
    const Camera& cref = cams[ref];
    std::vector<Point>& out = per_ref[pi];

    for (int y = 0; y < dref.h; ++y) {
      for (int x = 0; x < dref.w; ++x) {
        const float d = dref.at(y, x);
        if (d <= min_depth || d >= max_depth || d <= 0) continue;
        const Vec3 X = unproject(cref, static_cast<float>(x),
                                 static_cast<float>(y), d);
        int consistent = 1;
        Vec3 acc = X;
        for (int sv : srcs) {
          if (!loaded[sv]) continue;
          float u, v2, dproj;
          if (!project(cams[sv], X, &u, &v2, &dproj)) continue;
          const float dsv = sample_bilinear(depths[sv], u, v2);
          if (dsv <= 0) continue;
          const float b = baseline(cref, cams[sv]);
          const float f = cams[sv].fx();
          const float disp_a = f * b / dproj;
          const float disp_b = f * b / dsv;
          if (std::fabs(disp_a - disp_b) < disp_threshold) {
            // Average in the agreeing view's surface point.
            const Vec3 Xs = unproject(cams[sv], u, v2, dsv);
            acc.x += Xs.x;
            acc.y += Xs.y;
            acc.z += Xs.z;
            ++consistent;
          }
        }
        if (consistent >= num_consistent) {
          Point pt;
          pt.p = {acc.x / consistent, acc.y / consistent, acc.z / consistent};
          if (colors[ref].w) {
            pt.r = static_cast<uint8_t>(colors[ref].at(y, x, 0) * 255.0f);
            pt.g = static_cast<uint8_t>(colors[ref].at(y, x, 1) * 255.0f);
            pt.b = static_cast<uint8_t>(colors[ref].at(y, x, 2) * 255.0f);
          } else {
            pt.r = pt.g = pt.b = 255;
          }
          out.push_back(pt);
        }
      }
    }
  }

  std::vector<Point> all;
  size_t total = 0;
  for (auto& v : per_ref) total += v.size();
  all.reserve(total);
  for (auto& v : per_ref) all.insert(all.end(), v.begin(), v.end());
  write_ply(out_ply, all);
  std::printf("tpu_fuser: %zu points -> %s\n", all.size(), out_ply.c_str());
  return 0;
}
