"""Configuration system: app .cfg files + frontend/backend parameter YAMLs.

Parity (WHAT): the reference's three config tiers
(/root/reference/MCApps/src/ParseSettings.cpp:10-88 defines the .cfg option
set via boost::program_options; OpenCV FileStorage YAMLs carry frontend and
backend parameters, read in FrontEnd.h:124-199 and Backend.cpp:24-106).
The .cfg grammar here matches boost::program_options config files
(`key=value`, `#` comments), with relative paths resolved against
`data_path` as the reference does (ParseSettings.cpp:100-160).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import yaml


# Full option set of the reference .cfg (ParseSettings.cpp:10-79), with the
# reference defaults.
_CFG_DEFAULTS = {
    "data_path": "",
    "images_path": "",
    "calib_file_path": "",
    "frontend_params_file": "",
    "backend_params_file": "",
    "vocabulary": "",
    "fbow_vocabulary": "",
    "traj_file": "trajectory.txt",
    "log_file": "",
    "logs_dir": "",
    "database_path": "",
    "map_path": "",
    "ros": "false",
    "parse_bag": "false",
    "bag_path": "",
    "camera_topics": "",
    "imu_topic": "",
    "gps_topic": "",
    "use_imu": "false",
    "use_gps": "false",
    "relocalization": "false",
    "navability": "false",
    "fast_tracking": "false",
    "segmentation": "false",
    "segmasks_path": "",
    "kalibr": "true",
    "undistort": "true",
    "radtan": "true",
    "num_cams": "1",
    "frames": "",
    "shifts": "",
    "imu_map_frame": "false",
    "video_streams": "",
    "debug_mode": "false",
    # dense depth reconstruction (reference calc_depth/depth_est,
    # ParseSettings.cpp:39-45); depth maps saved per keyframe
    "calc_depth": "false",
    "depth_dir": "",
    "depth_max_disp": "64",
    # multi-chip: shard window-BA solves across this many devices
    # (0 = single chip)
    "mesh_devices": "0",
}

_BOOL_KEYS = {
    "ros", "parse_bag", "use_imu", "use_gps", "relocalization", "navability",
    "fast_tracking", "segmentation", "kalibr", "undistort", "radtan",
    "imu_map_frame", "debug_mode", "calc_depth",
}
_PATH_KEYS = {
    "images_path", "calib_file_path", "frontend_params_file",
    "backend_params_file", "vocabulary", "fbow_vocabulary", "traj_file",
    "log_file", "logs_dir", "database_path", "map_path", "bag_path",
    "segmasks_path", "video_streams", "depth_dir",
}


@dataclasses.dataclass
class AppSettings:
    """Parsed .cfg settings (reference MCDataUtilParams equivalent,
    /root/reference/MCDataUtils/include/MCDataUtils/MCDataUtilParams.h)."""

    raw: dict

    def __getattr__(self, k):
        try:
            return self.raw[k]
        except KeyError as e:
            raise AttributeError(k) from e

    @property
    def frames_range(self):
        """'start,end' or 'start,end,step' CSV -> tuple or None."""
        s = self.raw.get("frames", "")
        if not s:
            return None
        parts = [int(x) for x in s.split(",")]
        return tuple(parts)

    @property
    def shifts(self):
        s = self.raw.get("shifts", "")
        if not s:
            return None
        return [int(x) for x in s.split(",")]


def parse_cfg(path) -> AppSettings:
    """Parse a boost::program_options-style config file."""
    values = dict(_CFG_DEFAULTS)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("["):
                continue
            if "=" not in line:
                continue
            k, v = line.split("=", 1)
            k = k.strip()
            v = v.split("#", 1)[0].strip()
            values[k] = v
    # bools
    out = {}
    for k, v in values.items():
        if k in _BOOL_KEYS:
            out[k] = str(v).lower() in ("1", "true", "yes", "on")
        else:
            out[k] = v
    # resolve relative paths against data_path (reference semantics)
    base = out.get("data_path", "")
    if base:
        for k in _PATH_KEYS:
            v = out.get(k, "")
            if v and not os.path.isabs(v):
                out[k] = str(Path(base) / v)
    out["num_cams"] = int(out["num_cams"])
    return AppSettings(raw=out)


# Frontend / backend parameter YAML keys (reference spec, SURVEY §5):
_FRONTEND_DEFAULTS = {
    "Vocabulary": "",
    "FBOWVocabulary": "",
    "ORBextractor.nFeatures": 1000,
    "ORBextractor.scaleFactor": 1.2,
    "ORBextractor.nLevels": 8,
    "ORBextractor.iniThFAST": 20,
    "ORBextractor.minThFAST": 7,
    "InitCondition": "RANSAC_FILTER",
    "PoseEstimation": "SEVENTEEN_PT",
    "InterMatch": "BoW",
    "KFBaselineThresholdTranslation": 0.12,
    "KFBaselineThresholdRotation": 0.12,
    "LogDir": "",
}

_BACKEND_DEFAULTS = {
    "CamID": 0,
    "MeasurementNoiseSigma": 1.0,
    "Optimization": 2,  # 0=ISAM2-equiv incremental, 1=LM batch, 2=fixed-lag
    "ISAMRelinearizeThreshold": 0.01,
    "ISAMRelinearizeSkip": 1,
    "WindowBad": 6,
    "AngleThresh": 1.0,
    "BackEndType": "MULTI_RIGID",
}


def _load_opencv_yaml(path):
    """OpenCV FileStorage YAML: strip the %YAML directive, parse the rest."""
    text = Path(path).read_text()
    lines = [
        l for l in text.splitlines()
        if not l.startswith("%YAML") and not l.startswith("---")
    ]
    return yaml.safe_load("\n".join(lines)) or {}


def load_frontend_params(path=None) -> dict:
    out = dict(_FRONTEND_DEFAULTS)
    if path and Path(path).exists():
        out.update(_load_opencv_yaml(path))
    return out


def load_backend_params(path=None) -> dict:
    out = dict(_BACKEND_DEFAULTS)
    if path and Path(path).exists():
        out.update(_load_opencv_yaml(path))
    return out


def slam_config_from_params(frontend: dict, backend: dict):
    """Map reference parameter names onto SlamConfig."""
    from mcslam_tpu.slam import SlamConfig

    return SlamConfig(
        kf_translation=float(frontend["KFBaselineThresholdTranslation"]),
        kf_rotation=float(frontend["KFBaselineThresholdRotation"]),
        window_size=int(backend["WindowBad"]),
    ), {
        "num_points": int(frontend["ORBextractor.nFeatures"]),
        "num_levels": int(frontend["ORBextractor.nLevels"]),
        "fast_threshold": float(frontend["ORBextractor.iniThFAST"]) / 255.0,
        "min_threshold": float(frontend["ORBextractor.minThFAST"]) / 255.0,
    }
