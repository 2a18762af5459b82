#!/bin/bash
# Round-4 on-chip measurement session (VERDICT r3 item #1).
#
# Polls the axon TPU relay; the moment it answers, runs the committed
# measurement kit sequentially into docs/onchip_r04/ logs:
#   bench.py, bisect_track.py, bisect_ba.py, bisect_frame.py,
#   bench_aux.py, plus the pre-registered env A/Bs
#   (MCSLAM_INVCDF_SAMPLING=1, MCSLAM_NO_UNROLL=1,
#    MCSLAM_LATE_COMPACT=1).
#
# Designed to run unattended (memory: axon-tunnel-operations —
# wait-then-measure turns relay downtime into zero lost wall-clock).
set -u
cd /root/repo
OUT=docs/onchip_r04
mkdir -p "$OUT"
STAMP() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "$(STAMP) session start" >> "$OUT/session.log"

# ---- phase 1: wait for the relay ----
while true; do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d" \
      >> "$OUT/session.log" 2>&1; then
    echo "$(STAMP) RELAY UP" >> "$OUT/session.log"
    break
  fi
  echo "$(STAMP) relay down (probe failed)" >> "$OUT/session.log"
  sleep 180
done

run() {
  local name="$1"; shift
  echo "$(STAMP) RUN $name: $*" >> "$OUT/session.log"
  timeout 1800 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "$(STAMP) DONE $name rc=$rc" >> "$OUT/session.log"
  return $rc
}

# ---- phase 1.5: sanity-gate the round-4 frame-build rewrites ----
# Round 4 adds two Pallas paths whose Mosaic lowering has only been
# exercised in interpret mode (no chip was up all round): the
# indexed-DMA patch kernel (early compaction) and the FAST height-skip
# variant. If a frame build fails on the real chip, fall back
# progressively rather than burning the relay window on a crash cascade.
sanity() {
  run "$1" python - <<'EOF'
import numpy as np, jax.numpy as jnp
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend.frame import build_frame
rig = synthetic.make_synthetic_rig(
    synthetic.SyntheticRigSpec(num_cams=4, image_size=(640, 480)))
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.rand(4, 480, 640).astype(np.float32))
ff = build_frame(imgs, rig, num_points=768, num_levels=4, max_intra=2048)
n = int(np.asarray(ff.kp_valid.sum()))
assert n > 100, n
print("sanity ok:", n, "keypoints")
EOF
}
if ! sanity sanity_frame; then
  echo "$(STAMP) SANITY FAILED -> MCSLAM_FAST_NO_HSKIP=1" >> "$OUT/session.log"
  export MCSLAM_FAST_NO_HSKIP=1
  if ! sanity sanity_frame_nohskip; then
    echo "$(STAMP) SANITY STILL FAILED -> MCSLAM_LATE_COMPACT=1" \
      >> "$OUT/session.log"
    export MCSLAM_LATE_COMPACT=1
    sanity sanity_frame_latecompact || \
      echo "$(STAMP) SANITY FAILED ON ALL FALLBACKS" >> "$OUT/session.log"
  fi
fi

# ---- phase 2: the measurement kit, priority order ----
# chip-measured fast-path take-rate first: bench.py reads
# docs/fastpath_rate.json for its stage-B mixing ratio
run fastpath python scripts/measure_fastpath.py
run bench python bench.py
run bisect_track python scripts/bisect_track.py
run bisect_frame python scripts/bisect_frame.py
run bisect_ba python scripts/bisect_ba.py
run bench_aux python scripts/bench_aux.py
run bisect_track_invcdf env MCSLAM_INVCDF_SAMPLING=1 python scripts/bisect_track.py
run bisect_track_nounroll env MCSLAM_NO_UNROLL=1 python scripts/bisect_track.py
run bisect_track_chol6 env MCSLAM_CHOL6=1 python scripts/bisect_track.py
# early-vs-late compaction A/B on the frame build (skip if the sanity
# gate already forced late)
if [ -z "${MCSLAM_LATE_COMPACT:-}" ]; then
  run bisect_frame_latecompact env MCSLAM_LATE_COMPACT=1 python scripts/bisect_frame.py
fi
# FAST height-skip A/B (skip if the sanity gate already disabled it)
if [ -z "${MCSLAM_FAST_NO_HSKIP:-}" ]; then
  run bisect_frame_nohskip env MCSLAM_FAST_NO_HSKIP=1 python scripts/bisect_frame.py
fi
# second bench pass for a quieter-window sample
run bench2 python bench.py

echo "$(STAMP) session complete" >> "$OUT/session.log"
