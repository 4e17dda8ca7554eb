// VideoCropAnnotator (C++/OpenCV) — native annotation tool.
//
// Capability-parity rebuild of the reference's C# WinForms annotator
// (reference annotator_software/frmMain.cs: video load/seek/play at :138,
// :429-464; drag-drop crop box :497-601; per-frame save :278-343) using
// OpenCV highgui so it runs without .NET.  Produces the RetargetVid
// annotation text format: one crop box per frame per line, either the
// dataset's 4-value "x1,y1,x2,y2" (default) or the annotator-native
// 2-value top-left "x,y" (--xy).
//
// Controls:
//   space        play / pause
//   a / d        step one frame back / forward
//   A / D        jump 10 frames
//   mouse drag   position the crop window on the current frame (marks done)
//                (on release, frames between the previous annotated frame
//                and this one are linearly interpolated — the reference's
//                mouse-up gap fill, frmMain.cs:505-558)
//   c            copy previous frame's box to this frame
//   f            fill all remaining frames with the current box
//   s            save annotations
//   q / ESC      save and quit
//
// Saving confirms before overwriting an existing annotation file and before
// writing an incomplete one (reference frmMain.cs:280-327); --force skips
// both prompts (and they auto-accept when stdin is not a terminal).
//
// A green "done bar" under the video shows annotated frames (the
// reference's progress bar equivalent).

#include <opencv2/opencv.hpp>

#include <unistd.h>

#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

namespace {

struct State {
  std::vector<cv::Rect> boxes;
  std::vector<bool> done;
  int frame_idx = 0;
  int n_frames = 0;
  int w = 0, h = 0;
  int crop_w = 0, crop_h = 0;
  bool dragging = false;
  bool playing = false;
  bool dirty = false;
};

cv::Rect clampBox(int cx, int cy, const State& st) {
  int x = cx - st.crop_w / 2;
  int y = cy - st.crop_h / 2;
  x = std::max(0, std::min(x, st.w - st.crop_w));
  y = std::max(0, std::min(y, st.h - st.crop_h));
  return cv::Rect(x, y, st.crop_w, st.crop_h);
}

// Reference mouse-up gap fill (frmMain.cs:505-558): after placing a box at
// frame F, positions between the last annotated frame before F and F are
// linearly interpolated (and marked done).
void interpolateGap(State* st, int upto) {
  int prev = -1;
  for (int i = upto - 1; i >= 0; i--)
    if (st->done[i]) { prev = i; break; }
  if (prev < 0 || upto - prev < 2) return;
  double steps = upto - prev;
  double sx = st->boxes[prev].x, sy = st->boxes[prev].y;
  double dx = (st->boxes[upto].x - sx) / steps;
  double dy = (st->boxes[upto].y - sy) / steps;
  for (int i = prev + 1; i < upto; i++) {
    st->boxes[i] = cv::Rect(static_cast<int>(sx + dx * (i - prev) + 0.5),
                            static_cast<int>(sy + dy * (i - prev) + 0.5),
                            st->crop_w, st->crop_h);
    st->done[i] = true;
  }
}

void onMouse(int event, int x, int y, int, void* userdata) {
  auto* st = static_cast<State*>(userdata);
  if (event == cv::EVENT_LBUTTONDOWN) st->dragging = true;
  if (event == cv::EVENT_LBUTTONUP && st->dragging) {
    st->dragging = false;
    interpolateGap(st, st->frame_idx);
  }
  if (st->dragging &&
      (event == cv::EVENT_MOUSEMOVE || event == cv::EVENT_LBUTTONDOWN)) {
    st->boxes[st->frame_idx] = clampBox(x, y, *st);
    st->done[st->frame_idx] = true;
    st->dirty = true;
  }
}

// Crop window dims for a "W:H" target ratio (reference sc_calc_dest_size
// semantics: preserve height unless the window would exceed the frame).
void cropDims(const std::string& ratio, int w, int h, int* cw, int* ch) {
  double rw = 1, rh = 1;
  std::sscanf(ratio.c_str(), "%lf:%lf", &rw, &rh);
  *cw = static_cast<int>(std::floor(rw / rh * h));
  *ch = h;
  if (*cw > w) {
    *cw = w;
    *ch = static_cast<int>(std::floor(rh / rw * w));
  }
}

bool saveAnnotations(const std::string& path, const State& st, bool xy_only) {
  std::ofstream out(path);
  if (!out) return false;
  for (int i = 0; i < st.n_frames; i++) {
    const cv::Rect& b = st.boxes[i];
    if (xy_only) {
      out << b.x << "," << b.y << "\n";
    } else {
      out << b.x << "," << b.y << "," << (b.x + b.width) << ","
          << (b.y + b.height) << "\n";
    }
  }
  return true;
}

// Console yes/no; auto-accepts when stdin is not a terminal (scripted use).
bool confirm(const std::string& question) {
  if (!isatty(fileno(stdin))) return true;
  std::printf("%s [y/N] ", question.c_str());
  std::fflush(stdout);
  std::string line;
  if (!std::getline(std::cin, line)) return false;
  return !line.empty() && (line[0] == 'y' || line[0] == 'Y');
}

// The reference's save gate (frmMain.cs:280-327): confirm before writing an
// incomplete annotation file, and before overwriting an existing one.
bool saveWithConfirm(const std::string& path, const State& st, bool xy_only,
                     bool force) {
  if (!force) {
    bool incomplete = false;
    for (int i = 0; i < st.n_frames; i++)
      if (!st.done[i]) { incomplete = true; break; }
    if (incomplete &&
        !confirm("You haven't set a crop box for all video frames!\n"
                 "Save an incomplete annotation file?"))
      return false;
    std::ifstream exists(path);
    if (exists.good() &&
        !confirm("Annotation file " + path + " already exists!\nOverwrite?"))
      return false;
  }
  return saveAnnotations(path, st, xy_only);
}

int loadAnnotations(const std::string& path, State* st) {
  std::ifstream in(path);
  if (!in) return 0;
  std::string line;
  int i = 0, loaded = 0;
  while (std::getline(in, line) && i < st->n_frames) {
    int x = 0, y = 0, x2 = 0, y2 = 0;
    int n = std::sscanf(line.c_str(), "%d,%d,%d,%d", &x, &y, &x2, &y2);
    if (n >= 2) {
      st->boxes[i] = cv::Rect(x, y, st->crop_w, st->crop_h);
      st->done[i] = true;
      loaded++;
    }
    i++;
  }
  return loaded;
}

int selfcheck() {
  // Fixed crop-window sizes from the target ratio, both benchmark ratios
  // (reference frmMain.cs:81-100: 1:3 preserves height, 3:1 preserves
  // width on the 640x360 DHF1K frame).
  State st;
  st.n_frames = 5;
  st.w = 640;
  st.h = 360;
  cropDims("1:3", st.w, st.h, &st.crop_w, &st.crop_h);
  if (st.crop_w != 120 || st.crop_h != 360) {
    std::fprintf(stderr, "selfcheck: 1:3 cropDims wrong (%d,%d)\n",
                 st.crop_w, st.crop_h);
    return 1;
  }
  int cw31 = 0, ch31 = 0;
  cropDims("3:1", st.w, st.h, &cw31, &ch31);
  if (cw31 != 640 || ch31 != 213) {
    std::fprintf(stderr, "selfcheck: 3:1 cropDims wrong (%d,%d)\n", cw31,
                 ch31);
    return 1;
  }

  // Annotation-format round trip.
  st.boxes.assign(st.n_frames, cv::Rect(0, 0, st.crop_w, st.crop_h));
  st.done.assign(st.n_frames, false);
  for (int i = 0; i < st.n_frames; i++)
    st.boxes[i] = clampBox(100 + 10 * i, 180, st);
  const char* tmp = "/tmp/annotator_selfcheck.txt";
  if (!saveAnnotations(tmp, st, false)) return 1;

  State st2 = st;
  st2.boxes.assign(st.n_frames, cv::Rect());
  st2.done.assign(st.n_frames, false);
  if (loadAnnotations(tmp, &st2) != st.n_frames) return 1;
  for (int i = 0; i < st.n_frames; i++) {
    if (st2.boxes[i].x != st.boxes[i].x || st2.boxes[i].y != st.boxes[i].y) {
      std::fprintf(stderr, "selfcheck: roundtrip mismatch at %d\n", i);
      return 1;
    }
  }
  std::remove(tmp);

  // Mouse-up gap interpolation (reference frmMain.cs:505-558): annotate
  // frame 0 at x=40 and frame 4 at x=80; frames 1-3 interpolate linearly.
  State st3 = st;
  st3.boxes.assign(st.n_frames, cv::Rect());
  st3.done.assign(st.n_frames, false);
  st3.boxes[0] = clampBox(100, 180, st3);
  st3.done[0] = true;
  st3.boxes[4] = clampBox(140, 180, st3);
  st3.done[4] = true;
  interpolateGap(&st3, 4);
  for (int i = 1; i < 4; i++) {
    int want = st3.boxes[0].x + (st3.boxes[4].x - st3.boxes[0].x) * i / 4;
    if (!st3.done[i] || st3.boxes[i].x != want) {
      std::fprintf(stderr, "selfcheck: interpolation wrong at %d (%d != %d)\n",
                   i, st3.boxes[i].x, want);
      return 1;
    }
  }

  // saveWithConfirm with a non-tty stdin auto-accepts (scripted use).
  if (!saveWithConfirm(tmp, st3, false, /*force=*/true)) return 1;
  std::remove(tmp);

  std::printf("selfcheck ok\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  std::string video, ratio = "1:3", user = "user", out_dir = ".";
  bool xy_only = false, force = false;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--selfcheck") return selfcheck();
    if (a == "--ratio" && i + 1 < argc) ratio = argv[++i];
    else if (a == "--user" && i + 1 < argc) user = argv[++i];
    else if (a == "--out" && i + 1 < argc) out_dir = argv[++i];
    else if (a == "--xy") xy_only = true;
    else if (a == "--force") force = true;
    else if (a == "--help" || a == "-h") {
      std::printf(
          "usage: annotator <video> [--ratio W:H] [--user NAME]\n"
          "                 [--out DIR] [--xy] [--force] [--selfcheck]\n");
      return 0;
    } else {
      video = a;
    }
  }
  if (video.empty()) {
    std::fprintf(stderr, "error: no video given (see --help)\n");
    return 2;
  }

  cv::VideoCapture cap(video);
  if (!cap.isOpened()) {
    std::fprintf(stderr, "error: cannot open %s\n", video.c_str());
    return 2;
  }

  State st;
  st.n_frames = static_cast<int>(cap.get(cv::CAP_PROP_FRAME_COUNT));
  st.w = static_cast<int>(cap.get(cv::CAP_PROP_FRAME_WIDTH));
  st.h = static_cast<int>(cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  double fps = cap.get(cv::CAP_PROP_FPS);
  cropDims(ratio, st.w, st.h, &st.crop_w, &st.crop_h);
  st.boxes.assign(st.n_frames,
                  cv::Rect((st.w - st.crop_w) / 2, (st.h - st.crop_h) / 2,
                           st.crop_w, st.crop_h));
  st.done.assign(st.n_frames, false);

  std::string stem = video.substr(video.find_last_of('/') + 1);
  stem = stem.substr(0, stem.find_last_of('.'));
  std::string ar = ratio;
  for (auto& ch : ar)
    if (ch == ':') ch = '-';
  std::string out_path =
      out_dir + "/annotations_" + user + "/" + stem + "_" + ar + ".txt";
  std::string out_parent = out_dir + "/annotations_" + user;
  std::string mkdir_cmd = "mkdir -p '" + out_parent + "'";
  if (std::system(mkdir_cmd.c_str()) != 0) return 2;
  int preloaded = loadAnnotations(out_path, &st);
  if (preloaded)
    std::printf("loaded %d existing annotations from %s\n", preloaded,
                out_path.c_str());

  const std::string win = "VideoCropAnnotator — " + stem + " (" + ratio + ")";
  cv::namedWindow(win, cv::WINDOW_AUTOSIZE);
  cv::setMouseCallback(win, onMouse, &st);
  cv::createTrackbar("frame", win, nullptr, std::max(st.n_frames - 1, 1));

  std::vector<cv::Mat> frames;  // decoded lazily as we seek
  cv::Mat frame;
  int last_decoded = -1;

  auto getFrame = [&](int idx) -> const cv::Mat& {
    if (idx != last_decoded) {
      cap.set(cv::CAP_PROP_POS_FRAMES, idx);
      cap.read(frame);
      last_decoded = idx;
    }
    return frame;
  };

  int delay = std::max(1, static_cast<int>(1000.0 / (fps > 0 ? fps : 30)));
  for (;;) {
    const cv::Mat& f = getFrame(st.frame_idx);
    if (f.empty()) break;
    cv::Mat disp = f.clone();
    const cv::Rect& b = st.boxes[st.frame_idx];
    cv::rectangle(disp, b, st.done[st.frame_idx] ? cv::Scalar(0, 220, 0)
                                                 : cv::Scalar(0, 160, 255),
                  2);
    char hud[160];
    std::snprintf(hud, sizeof(hud), "frame %d/%d  box(%d,%d)  %s",
                  st.frame_idx + 1, st.n_frames, b.x, b.y,
                  st.playing ? "PLAY" : "PAUSE");
    cv::putText(disp, hud, {8, 20}, cv::FONT_HERSHEY_SIMPLEX, 0.55,
                {255, 255, 255}, 1);
    // done bar
    cv::Mat bar(8, st.w, CV_8UC3, cv::Scalar(40, 40, 40));
    for (int i = 0; i < st.n_frames; i++)
      if (st.done[i]) {
        int x0 = i * st.w / st.n_frames;
        int x1 = std::max(x0 + 1, (i + 1) * st.w / st.n_frames);
        cv::rectangle(bar, {x0, 0}, {x1, 8}, cv::Scalar(0, 200, 0), -1);
      }
    cv::vconcat(disp, bar, disp);
    cv::imshow(win, disp);
    cv::setTrackbarPos("frame", win, st.frame_idx);

    int key = cv::waitKey(st.playing ? delay : 20);
    if (key == 'q' || key == 27) break;
    switch (key) {
      case ' ': st.playing = !st.playing; break;
      case 'a': st.frame_idx = std::max(0, st.frame_idx - 1); break;
      case 'd': st.frame_idx = std::min(st.n_frames - 1, st.frame_idx + 1); break;
      case 'A': st.frame_idx = std::max(0, st.frame_idx - 10); break;
      case 'D': st.frame_idx = std::min(st.n_frames - 1, st.frame_idx + 10); break;
      case 'c':
        if (st.frame_idx > 0) {
          st.boxes[st.frame_idx] = st.boxes[st.frame_idx - 1];
          st.done[st.frame_idx] = true;
          st.dirty = true;
        }
        break;
      case 'f':
        for (int i = st.frame_idx; i < st.n_frames; i++) {
          st.boxes[i] = st.boxes[st.frame_idx];
          st.done[i] = true;
        }
        st.dirty = true;
        break;
      case 's':
        if (saveWithConfirm(out_path, st, xy_only, force)) {
          std::printf("saved %s\n", out_path.c_str());
          st.dirty = false;
        }
        break;
      default: break;
    }
    int tb = cv::getTrackbarPos("frame", win);
    if (tb != st.frame_idx && key == -1 && !st.playing) st.frame_idx = tb;
    if (st.playing && st.frame_idx < st.n_frames - 1) st.frame_idx++;
  }

  if (st.dirty && saveWithConfirm(out_path, st, xy_only, force))
    std::printf("saved %s\n", out_path.c_str());
  return 0;
}
