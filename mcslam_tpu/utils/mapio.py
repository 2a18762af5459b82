"""Session artifact I/O: JSON map + graph-log stream, format-compatible with
the reference so its relocalization round-trip and offline replay tooling
carry over.

Parity (WHAT):
  * JSON map: per-KF entry with landmark ids, 3D points, descriptors,
    timestamp, pose (FrontEnd::appendLogsJSONformat/serializeJSONObject,
    /root/reference/MCSlam/src/FrontEnd.cpp:7387-7413)
  * graph_logs text records: 'x' kfID + 4x4 pose, 'l' lid + 3D, 'e' kfID
    camID u v edges, 'g' GPS ENU + reference lat/lon/alt, 'k' loop relative
    pose, 'm' loop measurements, 'imu_raw' (FrontEnd::appendLogs,
    FrontEnd.cpp:7415-7542,8355-8372) — the grammar consumed by the
    reference's offline replay harness (reduced_camera_system.cpp).
"""

from __future__ import annotations

import json

import numpy as np


def save_map_json(path, keyframes, lm_map) -> None:
    """Write the session map: one entry per keyframe."""
    out = []
    for kf in keyframes:
        sel = np.nonzero(kf.lm_id >= 0)[0]
        lids = kf.lm_id[sel]
        ok = lm_map.valid[lids]
        sel, lids = sel[ok], lids[ok]
        entry = {
            "kfID": int(kf.kf_id),
            "timestamp": float(kf.timestamp),
            "pose": [float(v) for v in kf.world_T_ref.reshape(-1)],
            "landmarks": [
                {
                    "lid": int(l),
                    "pt3D": [float(v) for v in lm_map.pos[l]],
                    "desc": [int(v) for v in lm_map.desc[l]],
                    "uv": [float(v) for v in kf.im_uv[s]],
                    "cam": int(kf.im_anchor_cam[s]),
                }
                for s, l in zip(sel, lids)
            ],
        }
        out.append(entry)
    with open(path, "w") as f:
        json.dump({"format": "mcslam_tpu_map_v1", "keyframes": out}, f)


def load_map_json(path):
    """-> (kf_entries list of dicts with numpy fields, lm dict id->(pos, desc))."""
    with open(path) as f:
        data = json.load(f)
    kfs = []
    lms = {}
    for e in data["keyframes"]:
        pose = np.array(e["pose"], np.float32).reshape(4, 4)
        lids = np.array([l["lid"] for l in e["landmarks"]], np.int32)
        uv = np.array([l["uv"] for l in e["landmarks"]], np.float32).reshape(-1, 2)
        cams = np.array([l["cam"] for l in e["landmarks"]], np.int32)
        descs = np.array([l["desc"] for l in e["landmarks"]], np.uint32).reshape(-1, 8)
        for l in e["landmarks"]:
            lms[int(l["lid"])] = (
                np.array(l["pt3D"], np.float32),
                np.array(l["desc"], np.uint32),
            )
        kfs.append(
            {
                "kfID": int(e["kfID"]),
                "timestamp": float(e["timestamp"]),
                "pose": pose,
                "lids": lids,
                "uv": uv,
                "cams": cams,
                "descs": descs,
            }
        )
    return kfs, lms


class GraphLogWriter:
    """Streaming graph_logs writer (reference record grammar)."""

    def __init__(self, path):
        self._f = open(path, "w")

    def close(self):
        self._f.close()

    def pose(self, kf_id: int, world_T_body: np.ndarray,
             timestamp: float = 0.0):
        """'x kfID ts p00..p33' (reference FrontEnd.cpp:7442 — the
        timestamp is what lets the replay harness segment imu_raw records
        into per-keyframe preintegration spans)."""
        vals = " ".join(f"{v:.9f}" for v in np.asarray(world_T_body).reshape(-1))
        self._f.write(f"x {kf_id} {timestamp:.9f} {vals}\n")

    def landmark(self, lid: int, pt: np.ndarray):
        self._f.write(f"l {lid} {pt[0]:.9f} {pt[1]:.9f} {pt[2]:.9f}\n")

    def edge(self, kf_id: int, cam_id: int, lid: int, u: float, v: float):
        self._f.write(f"e {kf_id} {cam_id} {lid} {u:.4f} {v:.4f}\n")

    def imu_raw(self, t: float, gyro, accel):
        g, a = np.asarray(gyro), np.asarray(accel)
        self._f.write(
            f"imu_raw {t:.9f} {g[0]:.9f} {g[1]:.9f} {g[2]:.9f} "
            f"{a[0]:.9f} {a[1]:.9f} {a[2]:.9f}\n"
        )

    def gps(self, kf_id: int, enu, ref_lla):
        e = np.asarray(enu)
        r = np.asarray(ref_lla)
        self._f.write(
            f"g {kf_id} {e[0]:.9f} {e[1]:.9f} {e[2]:.9f} "
            f"{r[0]:.9f} {r[1]:.9f} {r[2]:.9f}\n"
        )

    def loop_pose(self, kf_query: int, kf_match: int, rel: np.ndarray):
        vals = " ".join(f"{v:.9f}" for v in np.asarray(rel).reshape(-1))
        self._f.write(f"k {kf_query} {kf_match} {vals}\n")

    def loop_measurement(self, kf_query: int, cam_id: int, lid: int, u, v):
        self._f.write(f"m {kf_query} {cam_id} {lid} {u:.4f} {v:.4f}\n")


def read_graph_logs(path):
    """Parse graph_logs into dict-of-lists per record type (replay input)."""
    out = {"x": [], "l": [], "e": [], "imu_raw": [], "g": [], "k": [], "m": []}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag, vals = parts[0], parts[1:]
            if tag == "x":
                if len(vals) >= 18:  # kfID ts pose16 (reference grammar)
                    out["x"].append(
                        (int(vals[0]), float(vals[1]),
                         np.array(vals[2:18], np.float64).reshape(4, 4))
                    )
                else:  # legacy: kfID pose16 (no timestamp)
                    out["x"].append(
                        (int(vals[0]), 0.0,
                         np.array(vals[1:17], np.float64).reshape(4, 4))
                    )
            elif tag == "l":
                out["l"].append((int(vals[0]), np.array(vals[1:4], np.float64)))
            elif tag == "e":
                out["e"].append(
                    (int(vals[0]), int(vals[1]), int(vals[2]),
                     float(vals[3]), float(vals[4]))
                )
            elif tag == "imu_raw":
                out["imu_raw"].append(
                    (float(vals[0]), np.array(vals[1:4], np.float64),
                     np.array(vals[4:7], np.float64))
                )
            elif tag == "g":
                out["g"].append(
                    (int(vals[0]), np.array(vals[1:4], np.float64),
                     np.array(vals[4:7], np.float64))
                )
            elif tag == "k":
                out["k"].append(
                    (int(vals[0]), int(vals[1]),
                     np.array(vals[2:18], np.float64).reshape(4, 4))
                )
            elif tag == "m":
                out["m"].append(
                    (int(vals[0]), int(vals[1]), int(vals[2]),
                     float(vals[3]), float(vals[4]))
                )
    return out
