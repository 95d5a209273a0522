"""DNA-Rendering .smc (HDF5) reader.

Parity: data/dna_rendering/dna_rendering_sample_code/SMCReader.py (399 LoC)
— the subset of the API the pipeline uses (dataset_readers.py:1010-1143):
actor_info, Camera_5mp/Camera_12mp color frames, per-camera calibration
(K, D, RT), masks, and SMPL-X parameters.
"""
from __future__ import annotations

import numpy as np


class SMCReader:
    def __init__(self, file_path: str):
        import h5py

        self.smc = h5py.File(file_path, "r")
        self.actor_info = None
        if "actor_info" in self.smc.attrs:
            self.actor_info = dict(self.smc.attrs["actor_info"])
        elif "Camera_5mp" in self.smc or "actor" in self.smc.attrs:
            pass
        # sample-code layout: attributes on the root group
        if self.actor_info is None:
            attrs = dict(self.smc.attrs)
            self.actor_info = {
                "id": attrs.get("actor_id", attrs.get("id", 0)),
                "gender": attrs.get("gender", "neutral"),
                "age": attrs.get("age", 0),
                "height": attrs.get("height", 0),
                "weight": attrs.get("weight", 0),
            }
        if isinstance(self.actor_info.get("gender"), bytes):
            self.actor_info["gender"] = self.actor_info["gender"].decode()

    # ---------------- images ----------------
    def _decode(self, payload) -> np.ndarray:
        arr = np.asarray(payload)
        if arr.ndim == 1:  # jpeg/png bytes
            import cv2

            return cv2.imdecode(arr, cv2.IMREAD_COLOR)
        return arr

    def get_img(self, camera_group: str, camera_id, Image_type: str = "color",
                Frame_id=None) -> np.ndarray:
        group = self.smc[camera_group][str(camera_id)][Image_type]
        if Frame_id is None:
            return np.stack([self._decode(group[k]) for k in sorted(group)])
        return self._decode(group[str(Frame_id)])

    def get_mask(self, camera_id, Frame_id=None) -> np.ndarray:
        group = self.smc["Mask"][str(camera_id)]["mask"]
        if Frame_id is None:
            return np.stack([self._decode(group[k]) for k in sorted(group)])
        m = self._decode(group[str(Frame_id)])
        return m[..., 0] if m.ndim == 3 else m

    # ---------------- calibration ----------------
    def get_Calibration(self, camera_id) -> dict:
        grp = self.smc["Camera_Parameter"][str(camera_id)]
        return {
            "K": np.asarray(grp["K"], np.float64),
            "D": np.asarray(grp["D"], np.float64),
            "RT": np.asarray(grp["RT"], np.float64),
            "Color_Calibration": np.asarray(grp["Color_Calibration"])
            if "Color_Calibration" in grp else None,
        }

    def get_Calibration_all(self) -> dict:
        return {
            cid: self.get_Calibration(cid)
            for cid in self.smc["Camera_Parameter"]
        }

    # ---------------- SMPL-X ----------------
    def get_SMPLx(self, Frame_id=None) -> dict:
        grp = self.smc["SMPLx"]
        out = {
            "betas": np.asarray(grp["betas"]),
            "expression": np.asarray(grp["expression"]),
            "fullpose": np.asarray(grp["fullpose"]),
            "transl": np.asarray(grp["transl"]),
        }
        if Frame_id is not None:
            fi = int(Frame_id)
            out["fullpose"] = out["fullpose"][fi]
            out["transl"] = out["transl"][fi]
            if out["betas"].ndim > 1:
                out["betas"] = out["betas"][0]
            if out["expression"].ndim > 1:
                out["expression"] = out["expression"][fi] \
                    if out["expression"].shape[0] > fi else out["expression"][0]
        return out

    def get_frame_count(self, camera_group: str = "Camera_5mp",
                        camera_id=0) -> int:
        return len(self.smc[camera_group][str(camera_id)]["color"])

    def get_camera_ids(self, camera_group: str = "Camera_5mp") -> list:
        return sorted(self.smc[camera_group], key=lambda s: int(s))
