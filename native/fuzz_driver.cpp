// Fuzz driver for the native audio decoder (qvc_audio.cpp).
//
// Runs qvc_probe + qvc_decode over every path on the command line — built
// with -fsanitize=address,undefined (make -C native asan) so any OOB
// access, overflow-UB, or capacity violation aborts the process. The
// pytest harness (tests/test_native_fuzz.py) feeds it a few hundred
// mutated/truncated/bit-flipped FLAC and WAV files; negative return codes
// are the EXPECTED outcome for malformed input — only sanitizer aborts,
// crashes, or hangs fail the gate.
//
// Each file is also decoded into a deliberately tiny buffer to exercise
// the capacity guard under ASAN (a missing bound would write past it).

#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
int qvc_probe(const char* path, int* kind, int* sample_rate, int* channels,
              int* bps, long long* frames, int* float_fmt);
long long qvc_decode(const char* path, int32_t* out, long long capacity);
}

int main(int argc, char** argv) {
  for (int a = 1; a < argc; ++a) {
    int kind = 0, sr = 0, ch = 0, bps = 0, ff = 0;
    long long frames = 0;
    int rc = qvc_probe(argv[a], &kind, &sr, &ch, &bps, &frames, &ff);
    long long full = -99, tiny = -99;
    if (rc == 0 && frames > 0 && ch > 0 && frames * ch < (1ll << 26)) {
      std::vector<int32_t> buf((size_t)(frames * ch));
      full = qvc_decode(argv[a], buf.data(), (long long)buf.size());
    }
    // capacity guard: a 16-sample buffer must never be overrun, only
    // rejected (-15) or partially... no — the contract is all-or-error.
    std::vector<int32_t> small(16);
    tiny = qvc_decode(argv[a], small.data(), 16);
    printf("%s probe=%d frames=%lld full=%lld tiny=%lld\n",
           argv[a], rc, frames, full, tiny);
  }
  return 0;
}
