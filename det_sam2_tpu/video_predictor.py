"""SAM2VideoPredictor: the host-side streaming state machine.

TPU re-design of /root/reference/sam2/sam2_video_predictor.py (1571 LoC).
The reference mutates a dict of per-frame tensors; here:

  * device state = one static-shape MemoryBank pytree (det_sam2_tpu/state.py)
    driven by the jitted SAM2Engine steps — no recompilation while streaming;
  * host state = numpy dicts of per-frame *outputs* (low-res mask logits,
    pointers, scores) used for consolidation and user-facing results;
  * frames = dict of normalized fp16 numpy frames (the fork's fp16 frame
    buffer, misc.py:327-328) with explicit release;
  * object slots are padded to a power-of-two bucket; adding an object
    mid-stream grows the bucket and re-consolidates recent cond frames
    (the fork's online new-object path, sam2_video_predictor.py:224-333).

API parity: init_state, update_state, add_new_points_or_box, add_new_mask,
propagate_in_video(_preflight), release_old_frames, save/load session
(preload memory bank), remove_object, reset_state,
clear_all_prompts_in_frame.
"""

from __future__ import annotations

import collections
import os
import pickle
from typing import Dict, Iterator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu import state as bank_ops
from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.sam2_base import (
    NO_OBJ_SCORE,
    apply_non_overlapping_constraints,
)
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.utils.misc import (
    AsyncFrameLoader,
    concat_points,
    list_frame_dir,
    load_video_frames,
    resize_masks_np,
)


def _bucket(n: int) -> int:
    return bank_ops.next_pow2(n)


class _LazyFrames(dict):
    """session.frames backed by an AsyncFrameLoader: every index is a
    member from the start (propagation's availability checks see the full
    video), but the pixels materialize on first access, blocking only until
    the background decode catches up (the reference's async_loading_frames,
    sam2/utils/misc.py AsyncVideoFrameLoader)."""

    def __init__(self, loader):
        super().__init__((i, None) for i in range(len(loader)))
        self._loader = loader

    def _materialize(self, k):
        v = dict.get(self, k)
        if v is None and k in self:
            v = self._loader[k]
            dict.__setitem__(self, k, v)
        return v

    def get(self, k, default=None):
        if k not in self:
            return default
        return self._materialize(k)

    def __getitem__(self, k):
        if k not in self:
            raise KeyError(k)
        return self._materialize(k)

    def values(self):  # profiling/save: only materialized frames have bytes
        return [v for v in dict.values(self) if v is not None]

    def materialized(self) -> dict:
        """Plain dict with every remaining frame decoded (for pickling)."""
        return {k: self._materialize(k) for k in list(self.keys())}


class InferenceSession:
    """All per-video state (the reference's `inference_state` dict)."""

    def __init__(self, cfg: SAM2Config, video_height: int, video_width: int):
        self.cfg = cfg
        self.video_height = video_height
        self.video_width = video_width
        self.frames: Dict[int, np.ndarray] = {}
        # device-resident frame cache: each frame uploads ONCE and is
        # reused by every window that covers it (Det-SAM2 windows overlap
        # ~2x: detect every 30 frames, track 60) — halves host->device
        # traffic in production and matters enormously over slow links
        self.frames_dev: Dict[int, "jnp.ndarray"] = {}
        self.num_frames = 0
        self.obj_id_to_idx: "collections.OrderedDict[int, int]" = (
            collections.OrderedDict()
        )
        self.obj_idx_to_id: Dict[int, int] = {}
        self.bank = None  # created lazily at first object
        self.bank_objs = 0
        # frame -> {"pred_masks" [O,1,s4,s4] fp16, "obj_ptr" [O,C] fp32,
        #           "object_score_logits" [O,1], "valid" [O] bool}
        self.cond_outputs: Dict[int, dict] = {}
        self.noncond_outputs: Dict[int, dict] = {}
        # obj_idx -> frame -> single-row dict (same keys, leading dim 1)
        self.temp_cond: Dict[int, Dict[int, dict]] = collections.defaultdict(dict)
        self.temp_noncond: Dict[int, Dict[int, dict]] = collections.defaultdict(
            dict
        )
        self.point_inputs_per_obj: Dict[int, Dict[int, dict]] = (
            collections.defaultdict(dict)
        )
        self.mask_inputs_per_obj: Dict[int, Dict[int, np.ndarray]] = (
            collections.defaultdict(dict)
        )
        self.frames_already_tracked: Dict[int, dict] = {}
        # released tracked frames, compacted to merged (start, end, reverse,
        # seq) intervals: the reference keeps frames_tracked forever (a
        # correction on an old frame must NOT be treated as an init cond
        # frame), but a per-frame dict grows without bound on endless
        # streams — ranges keep the semantics at O(1) memory. `seq` is a
        # monotonic compaction stamp: a frame re-tracked in the OPPOSITE
        # direction and re-released creates an overlapping range whose
        # newer stamp must win in tracked_info.
        self.tracked_ranges: List[Tuple[int, int, bool, int]] = []
        self._compact_seq = 0
        # prompted non-cond frames whose outputs are reused in propagation
        # (the reference's consolidated_frame_inds["non_cond_frame_outputs"])
        self.consolidated_noncond: set = set()
        self.tracking_has_started = False
        self.pre_frames = 0  # preload memory bank frame count
        self.preload_cond_indices: List[int] = []
        self._feat_cache: Optional[Tuple[int, tuple]] = None
        # frame_idx -> empty-mask pointer (the reference computes
        # _get_empty_mask_ptr per frame from that frame's features)
        self._empty_ptr: Dict[int, np.ndarray] = {}

    def tracked_info(self, frame_idx: int) -> Optional[dict]:
        """{'reverse': bool} if frame_idx was ever tracked (live dict or a
        compacted released range), else None."""
        row = self.frames_already_tracked.get(frame_idx)
        if row is not None:
            return row
        best = None
        for s, e, rev, seq in self.tracked_ranges:
            if s <= frame_idx <= e and (best is None or seq > best[1]):
                best = (rev, seq)
        return None if best is None else {"reverse": best[0]}

    def compact_tracked(self, upto_idx: int) -> None:
        """Move frames_already_tracked entries with idx <= upto_idx into
        merged tracked_ranges (called by release_old_frames)."""
        moved = [t for t in self.frames_already_tracked if t <= upto_idx]
        if not moved:
            return
        self._compact_seq += 1
        for t in moved:
            rev = bool(self.frames_already_tracked.pop(t)["reverse"])
            self.tracked_ranges.append((t, t, rev, self._compact_seq))
        self.tracked_ranges.sort(key=lambda r: r[:2])
        merged: List[Tuple[int, int, bool, int]] = []
        for s, e, rev, seq in self.tracked_ranges:
            if merged and merged[-1][2] == rev and s <= merged[-1][1] + 1:
                ps, pe, prev, pseq = merged[-1]
                merged[-1] = (ps, max(pe, e), prev, max(pseq, seq))
            else:
                merged.append((s, e, rev, seq))
        self.tracked_ranges = merged

    @property
    def obj_ids(self) -> List[int]:
        return list(self.obj_id_to_idx.keys())

    @property
    def num_objects(self) -> int:
        return len(self.obj_id_to_idx)


class SAM2VideoPredictor:
    def __init__(
        self,
        engine: SAM2Engine,
        non_overlap_masks: bool = False,
        clear_non_cond_mem_around_input: bool = False,
        clear_non_cond_mem_for_multi_obj: bool = False,
        add_all_frames_to_correct_as_cond: bool = False,
        max_update_length_for_new_obj_id: int = 100,
        mask_resize: str = "host",  # 'host' (cv2, cheap transfers) | 'device'
    ):
        self.engine = engine
        self.cfg = engine.cfg
        self.image_size = engine.cfg.image_size
        self.non_overlap_masks = non_overlap_masks
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        self.add_all_frames_to_correct_as_cond = add_all_frames_to_correct_as_cond
        self.max_update_length_for_new_obj_id = max_update_length_for_new_obj_id
        self.mask_resize = mask_resize

    # ------------------------------------------------------------------
    # state lifecycle
    # ------------------------------------------------------------------

    def init_state(
        self,
        video_path: Union[str, List, np.ndarray],
        video_height: Optional[int] = None,
        video_width: Optional[int] = None,
        async_loading_frames: bool = False,
    ) -> InferenceSession:
        """Load/normalize frames and build a fresh session
        (sam2_video_predictor.py:43-120). With async_loading_frames, a
        frame-dir / path-list source decodes on a background thread and
        tracking starts immediately (reference init_state's flag)."""
        if async_loading_frames:
            paths = None
            if isinstance(video_path, str) and os.path.isdir(video_path):
                paths = list_frame_dir(video_path)
            elif isinstance(video_path, list) and video_path and isinstance(
                video_path[0], str
            ):
                paths = list(video_path)
            if paths:
                loader = AsyncFrameLoader(paths, self.image_size)
                loader[0]  # sets video_height/width, surfaces bad paths now
                session = InferenceSession(
                    self.cfg,
                    video_height or loader.video_height,
                    video_width or loader.video_width,
                )
                session.frames = _LazyFrames(loader)
                session.num_frames = len(loader)
                self._get_feats(session, 0)
                return session
            # ndarray sources are already decoded — fall through
        frames, h, w = load_video_frames(video_path, self.image_size)
        session = InferenceSession(
            self.cfg, video_height or h, video_width or w
        )
        for i, f in enumerate(frames):
            session.frames[i] = f
        session.num_frames = len(frames)
        # warm up the encoder on frame 0 (reference :119)
        self._get_feats(session, 0)
        return session

    def update_state(
        self, video_path: Union[str, List, np.ndarray], session: InferenceSession
    ) -> InferenceSession:
        """Streaming append of new frames (fork, :159-205)."""
        frames, h, w = load_video_frames(video_path, self.image_size)
        assert (h, w) == (session.video_height, session.video_width), (
            "appended frames must match the session video size"
        )
        start = session.num_frames
        for i, f in enumerate(frames):
            session.frames[start + i] = f
        session.num_frames = start + len(frames)
        return session

    def reset_state(self, session: InferenceSession) -> None:
        fresh = InferenceSession(
            self.cfg, session.video_height, session.video_width
        )
        fresh.frames = session.frames
        fresh.num_frames = session.num_frames
        session.__dict__.update(fresh.__dict__)

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _active_mask(self, session: InferenceSession) -> np.ndarray:
        mask = np.zeros(session.bank_objs, bool)
        for obj_idx in session.obj_idx_to_id:
            mask[obj_idx] = True
        return mask

    def _device_frame(self, session: InferenceSession, frame_idx: int):
        """Upload-once device cache of a frame (uint8 model-size); evicted
        together with the host frame by release_old_frames."""
        arr = session.frames_dev.get(frame_idx)
        if arr is None:
            frame = session.frames.get(frame_idx)
            if frame is None:
                raise KeyError(
                    f"frame {frame_idx} is not available (released or never "
                    "loaded)"
                )
            arr = jnp.asarray(frame)
            session.frames_dev[frame_idx] = arr
        return arr

    def _get_feats(self, session: InferenceSession, frame_idx: int):
        """LRU-1 feature cache (reference :1174-1212)."""
        if session._feat_cache is not None and session._feat_cache[0] == frame_idx:
            return session._feat_cache[1]
        img = self._device_frame(session, frame_idx)[None]
        feats = self.engine.encode_image(img)
        session._feat_cache = (frame_idx, feats)
        return feats

    def _ensure_bank(self, session: InferenceSession, num_objects: int) -> None:
        if num_objects > self.cfg.max_objects:
            raise ValueError(
                f"object count {num_objects} exceeds SAM2Config.max_objects="
                f"{self.cfg.max_objects}; raise the config cap"
            )
        target = _bucket(max(num_objects, 1))
        dtype = self.engine.dtype
        if session.bank is None:
            session.bank = bank_ops.init_bank(
                self.cfg, target, dtype=dtype,
                banked_layers=self.engine.banked_layers,
            )
            session.bank_objs = target
        elif target > session.bank_objs:
            session.bank = bank_ops.grow_objects(session.bank, target)
            old = session.bank_objs
            session.bank_objs = target
            self._pad_outputs(session, old, target)

    def _pad_outputs(self, session, old_o: int, new_o: int) -> None:
        pad = new_o - old_o

        def _pad_store(store):
            for frame_idx, out in store.items():
                out["pred_masks"] = np.concatenate(
                    [
                        out["pred_masks"],
                        np.full(
                            (pad, *out["pred_masks"].shape[1:]),
                            NO_OBJ_SCORE,
                            out["pred_masks"].dtype,
                        ),
                    ]
                )
                out["obj_ptr"] = np.concatenate(
                    [
                        out["obj_ptr"],
                        np.full((pad, out["obj_ptr"].shape[1]), NO_OBJ_SCORE,
                                out["obj_ptr"].dtype),
                    ]
                )
                out["object_score_logits"] = np.concatenate(
                    [out["object_score_logits"], np.full((pad, 1), 10.0, np.float32)]
                )
                out["valid"] = np.concatenate([out["valid"], np.zeros(pad, bool)])

        _pad_store(session.cond_outputs)
        _pad_store(session.noncond_outputs)

    def _obj_id_to_idx(self, session: InferenceSession, obj_id: int) -> int:
        """Map client id -> slot; mid-stream new ids trigger bank growth +
        re-consolidation (fork, :224-333)."""
        if obj_id in session.obj_id_to_idx:
            return session.obj_id_to_idx[obj_id]
        # smallest free slot (slots are non-contiguous after remove_object;
        # freed slots are safe to reuse because remove_object blanks their
        # bank rows via clear_object_rows)
        obj_idx = 0
        while obj_idx in session.obj_idx_to_id:
            obj_idx += 1
        session.obj_id_to_idx[obj_id] = obj_idx
        session.obj_idx_to_id[obj_idx] = obj_id
        self._ensure_bank(session, obj_idx + 1)
        if session.tracking_has_started:
            # fork semantics (:250-327): adding an object after tracking has
            # started re-encodes recent + preload cond frames so every bank
            # memory carries a (placeholder) row for the new object
            self._reconsolidate_for_new_obj(session)
        return obj_idx

    def _reconsolidate_for_new_obj(self, session: InferenceSession) -> None:
        """Re-encode recent + preload cond frames so every bank memory has
        rows for the grown object axis (fork semantics, :250-327)."""
        cond_frames = sorted(session.cond_outputs.keys())
        recent = cond_frames[-self.max_update_length_for_new_obj_id :]
        targets = sorted(set(recent) | set(session.preload_cond_indices))
        for frame_idx in targets:
            if frame_idx not in session.frames:
                continue  # image released; its memory keeps zero rows
            self._consolidate(
                session, frame_idx, is_cond=True, run_mem_encoder=True
            )

    def _refresh_cond_bucket(self, session: InferenceSession) -> None:
        """Size the attended cond-tile set to the live cond count (bucketed;
        static bank metadata — steps recompile per bucket, bounded set).
        Semantics stay exact: bucket >= live count up to cond_attn_size."""
        if session.bank is None:
            return
        live = len(set(session.cond_outputs) | set(session.preload_cond_indices))
        b = bank_ops.cond_tile_bucket(self.cfg, live)
        if b != session.bank.attend_cond_tiles:
            session.bank = session.bank.replace(attend_cond_tiles=b)

    def _empty_mask_ptr(self, session: InferenceSession, frame_idx: int):
        if frame_idx not in session._empty_ptr:
            feats = self._get_feats(session, frame_idx)
            ptr = self.engine.empty_mask_ptr(feats, frame_idx)
            session._empty_ptr[frame_idx] = np.asarray(ptr, np.float32)
        return session._empty_ptr[frame_idx]

    def _lookup_output_row(self, session, obj_idx: int, frame_idx: int,
                           prefer_cond_temp: bool = True):
        """temp -> cond store -> non-cond store (reference :700-720)."""
        for temp in (session.temp_cond, session.temp_noncond):
            out = temp[obj_idx].get(frame_idx)
            if out is not None:
                return out, True
        for store in (session.cond_outputs, session.noncond_outputs):
            out = store.get(frame_idx)
            if out is not None and obj_idx < len(out["valid"]) and out["valid"][obj_idx]:
                return (
                    {
                        "pred_masks": out["pred_masks"][obj_idx : obj_idx + 1],
                        "obj_ptr": out["obj_ptr"][obj_idx : obj_idx + 1],
                        "object_score_logits": out["object_score_logits"][
                            obj_idx : obj_idx + 1
                        ],
                    },
                    True,
                )
        return None, False

    def _consolidate(
        self,
        session: InferenceSession,
        frame_idx: int,
        is_cond: bool,
        run_mem_encoder: bool,
        consolidate_at_video_res: bool = False,
    ) -> dict:
        """Merge per-object outputs for one frame
        (reference _consolidate_temp_output_across_obj :644-767)."""
        o = session.bank_objs
        s4 = self.image_size // 4
        if consolidate_at_video_res:
            assert not run_mem_encoder
            h, w = session.video_height, session.video_width
        else:
            h = w = s4
        masks = np.full((o, 1, h, w), NO_OBJ_SCORE, np.float32)
        ptrs = np.full((o, self.cfg.hidden_dim), NO_OBJ_SCORE, np.float32)
        scores = np.full((o, 1), 10.0, np.float32)
        valid = np.zeros(o, bool)

        for obj_idx in sorted(session.obj_idx_to_id):
            row, found = self._lookup_output_row(session, obj_idx, frame_idx)
            if not found:
                if run_mem_encoder:
                    ptrs[obj_idx] = self._empty_mask_ptr(session, frame_idx)[0]
                continue
            m = np.asarray(row["pred_masks"], np.float32)
            if m.shape[-2:] != (h, w):
                if self.mask_resize == "host":
                    m = resize_masks_np(m, (h, w))
                else:
                    m = np.asarray(
                        self.engine.resize_masks(jnp.asarray(m), (h, w)),
                        np.float32,
                    )
            masks[obj_idx] = m[0]
            ptrs[obj_idx] = np.asarray(row["obj_ptr"], np.float32)[0]
            scores[obj_idx] = np.asarray(
                row["object_score_logits"], np.float32
            )[0]
            valid[obj_idx] = True

        out = {
            "pred_masks": masks,
            "obj_ptr": ptrs,
            "object_score_logits": scores,
            "valid": valid,
        }

        if run_mem_encoder:
            feats = self._get_feats(session, frame_idx)
            if is_cond:
                # host np arrays pass straight through: the engine converts
                # with np.asarray before the jitted call, so wrapping in
                # jnp here would upload + read back + re-upload per frame
                session.bank = self.engine.encode_cond_memory(
                    feats,
                    session.bank,
                    frame_idx,
                    masks,
                    scores,
                    np.asarray(ptrs, np.float32),
                    is_mask_from_pts=True,
                    pinned=frame_idx in session.preload_cond_indices,
                    obj_valid=np.asarray(self._active_mask(session)),
                )
                session.bank = bank_ops.invalidate_noncond(
                    session.bank, jnp.int32(frame_idx)
                )
            else:
                # corrections on tracked frames stay NON-cond memories
                # (reference stores them in non_cond_frame_outputs)
                session.bank = self.engine.encode_noncond_memory(
                    feats,
                    session.bank,
                    frame_idx,
                    masks,
                    scores,
                    np.asarray(ptrs, np.float32),
                    is_mask_from_pts=True,
                    obj_valid=np.asarray(self._active_mask(session)),
                )
            store = session.cond_outputs if is_cond else session.noncond_outputs
            store[frame_idx] = {
                "pred_masks": masks.astype(np.float16),
                "obj_ptr": ptrs,
                "object_score_logits": scores,
                "valid": valid,
            }
            self._refresh_cond_bucket(session)
        return out

    def _video_res_masks(self, session, masks_np: np.ndarray) -> np.ndarray:
        """Low-res logits [O,1,h,w] -> video-res np
        (reference _get_orig_video_res_output :617-641)."""
        target = (session.video_height, session.video_width)
        if masks_np.shape[-2:] != target:
            if self.mask_resize == "host":
                m = resize_masks_np(np.asarray(masks_np, np.float32), target)
            else:
                m = np.asarray(
                    self.engine.resize_masks(
                        jnp.asarray(masks_np, np.float32), target
                    )
                )
        else:
            m = np.asarray(masks_np, np.float32)
        if self.non_overlap_masks:
            m = np.asarray(
                apply_non_overlapping_constraints(jnp.asarray(m))
            )
        return m

    # ------------------------------------------------------------------
    # prompts
    # ------------------------------------------------------------------

    def add_new_points_or_box(
        self,
        session: InferenceSession,
        frame_idx: int,
        obj_id: int,
        points=None,
        labels=None,
        clear_old_points: bool = True,
        normalize_coords: bool = True,
        box=None,
    ):
        """(reference :343-520)"""
        obj_idx = self._obj_id_to_idx(session, obj_id)
        if (points is not None) != (labels is not None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError("at least one of points or box must be provided")

        points = (
            np.zeros((0, 2), np.float32)
            if points is None
            else np.asarray(points, np.float32)
        )
        labels = (
            np.zeros((0,), np.int32)
            if labels is None
            else np.asarray(labels, np.int32)
        )
        if points.ndim == 2:
            points = points[None]
        if labels.ndim == 1:
            labels = labels[None]
        if box is not None:
            if not clear_old_points:
                raise ValueError(
                    "box prompts must precede point prompts "
                    "(use clear_old_points=True)"
                )
            box = np.asarray(box, np.float32).reshape(1, 2, 2)
            box_labels = np.asarray([[2, 3]], np.int32)
            points = np.concatenate([box, points], axis=1)
            labels = np.concatenate([box_labels, labels], axis=1)
        if normalize_coords:
            points = points / np.asarray(
                [session.video_width, session.video_height], np.float32
            )
        points = points * self.image_size

        if not clear_old_points:
            old = session.point_inputs_per_obj[obj_idx].get(frame_idx)
        else:
            old = None
        point_inputs = concat_points(old, points, labels)
        session.point_inputs_per_obj[obj_idx][frame_idx] = point_inputs
        session.mask_inputs_per_obj[obj_idx].pop(frame_idx, None)

        tracked = session.tracked_info(frame_idx)
        is_init = tracked is None
        reverse = False if is_init else tracked["reverse"]
        is_cond = is_init or self.add_all_frames_to_correct_as_cond
        temp = session.temp_cond if is_cond else session.temp_noncond

        prev_row, found = self._lookup_output_row(session, obj_idx, frame_idx)
        prev_logits = None
        if found and prev_row["pred_masks"] is not None:
            prev_logits = np.asarray(prev_row["pred_masks"], np.float32)

        # batched prompt step: this object's row carries the real prompt,
        # others are dummy (-1) and their outputs are discarded
        o = session.bank_objs
        p = point_inputs["point_coords"].shape[1]
        all_pts = np.zeros((o, p, 2), np.float32)
        all_lbl = -np.ones((o, p), np.int32)
        all_pts[obj_idx] = point_inputs["point_coords"][0]
        all_lbl[obj_idx] = point_inputs["point_labels"][0]
        prev_all = None
        if prev_logits is not None:
            s4 = self.image_size // 4
            prev_all = np.zeros((o, 1, s4, s4), np.float32)
            prev_all[obj_idx] = prev_logits[0]

        feats = self._get_feats(session, frame_idx)
        out = self.engine.prompt_step(
            feats,
            session.bank,
            frame_idx,
            session.num_frames,
            jnp.asarray(all_pts),
            jnp.asarray(all_lbl),
            is_init=is_init,
            reverse=reverse,
            prev_logits=None if prev_all is None else jnp.asarray(prev_all),
        )
        temp[obj_idx][frame_idx] = {
            "pred_masks": np.asarray(out["pred_masks"], np.float32)[
                obj_idx : obj_idx + 1
            ],
            "obj_ptr": np.asarray(out["obj_ptr"], np.float32)[
                obj_idx : obj_idx + 1
            ],
            "object_score_logits": np.asarray(
                out["object_score_logits"], np.float32
            )[obj_idx : obj_idx + 1],
        }

        consolidated = self._consolidate(
            session, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True,
        )
        video_res_masks = self._video_res_masks(
            session, consolidated["pred_masks"]
        )
        return frame_idx, session.obj_ids, video_res_masks

    def add_new_mask(self, session, frame_idx: int, obj_id: int, mask):
        """(reference :526-616)"""
        obj_idx = self._obj_id_to_idx(session, obj_id)
        mask = np.asarray(mask)
        assert mask.ndim == 2
        mask_f = mask.astype(np.float32)[None, :, :, None]  # [1, H, W, 1]
        if mask.shape != (self.image_size, self.image_size):
            from det_sam2_tpu.utils.resize import torch_resize_hw

            m = torch_resize_hw(
                jnp.asarray(mask_f[..., 0]),
                (self.image_size, self.image_size),
                mode="bilinear",
                antialias=True,
            )
            mask_f = np.asarray((np.asarray(m) >= 0.5), np.float32)[..., None]
        session.mask_inputs_per_obj[obj_idx][frame_idx] = mask_f
        session.point_inputs_per_obj[obj_idx].pop(frame_idx, None)

        tracked = session.tracked_info(frame_idx)
        is_init = tracked is None
        reverse = False if is_init else tracked["reverse"]
        is_cond = is_init or self.add_all_frames_to_correct_as_cond
        temp = session.temp_cond if is_cond else session.temp_noncond

        o = session.bank_objs
        all_masks = np.zeros((o, self.image_size, self.image_size, 1), np.float32)
        all_masks[obj_idx] = mask_f[0]
        feats = self._get_feats(session, frame_idx)
        out = self.engine.mask_prompt_step(
            feats, session.bank, frame_idx, session.num_frames,
            jnp.asarray(all_masks), is_init=is_init, reverse=reverse,
        )
        temp[obj_idx][frame_idx] = {
            "pred_masks": np.asarray(out["pred_masks"], np.float32)[
                obj_idx : obj_idx + 1
            ],
            "obj_ptr": np.asarray(out["obj_ptr"], np.float32)[
                obj_idx : obj_idx + 1
            ],
            "object_score_logits": np.asarray(
                out["object_score_logits"], np.float32
            )[obj_idx : obj_idx + 1],
        }
        consolidated = self._consolidate(
            session, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True,
        )
        video_res_masks = self._video_res_masks(
            session, consolidated["pred_masks"]
        )
        return frame_idx, session.obj_ids, video_res_masks

    # ------------------------------------------------------------------
    # propagation
    # ------------------------------------------------------------------

    def propagate_in_video_preflight(self, session: InferenceSession) -> None:
        """Consolidate temp outputs into the main store + memory bank
        (reference :806-893)."""
        session.tracking_has_started = True
        for is_cond in (False, True):
            temp_store = session.temp_cond if is_cond else session.temp_noncond
            frame_inds = set()
            for per_frame in temp_store.values():
                frame_inds.update(per_frame.keys())
            for frame_idx in sorted(frame_inds):
                self._consolidate(
                    session, frame_idx, is_cond=is_cond, run_mem_encoder=True
                )
                if not is_cond:
                    session.consolidated_noncond.add(frame_idx)
                if self.clear_non_cond_mem_around_input and (
                    self.clear_non_cond_mem_for_multi_obj
                    or session.num_objects <= 1
                ):
                    self._clear_non_cond_mem_around_input(session, frame_idx)
            for per_frame in temp_store.values():
                per_frame.clear()
        # a frame must not be both cond and non-cond
        for frame_idx in session.cond_outputs:
            session.noncond_outputs.pop(frame_idx, None)

    def propagate_in_video(
        self,
        session: InferenceSession,
        start_frame_idx: Optional[int] = None,
        max_frame_num_to_track: Optional[int] = None,
        reverse: bool = False,
    ) -> Iterator[Tuple[int, List[int], np.ndarray]]:
        """(reference :910-1025; fork's exact reverse window :963)"""
        self.propagate_in_video_preflight(session)
        if not session.cond_outputs:
            raise RuntimeError("no prompts provided; add points first")
        num_frames = session.num_frames
        if start_frame_idx is None:
            start_frame_idx = min(session.cond_outputs)
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames
        if reverse:
            end_frame_idx = max(start_frame_idx - max_frame_num_to_track + 1, 0)
            processing_order = (
                range(start_frame_idx, end_frame_idx - 1, -1)
                if start_frame_idx > 0
                else []
            )
        else:
            end_frame_idx = min(
                start_frame_idx + max_frame_num_to_track, num_frames - 1
            )
            processing_order = range(start_frame_idx, end_frame_idx + 1)

        # FAST PATH: the whole window as one jitted lax.scan when every
        # frame image is available and no cond-frame side effects are
        # needed (engine.propagate_window) — one upload/dispatch/download.
        order = list(processing_order)
        clear_nc = self.clear_non_cond_mem_around_input and (
            self.clear_non_cond_mem_for_multi_obj or session.num_objects <= 1
        )
        def _skip(fi):
            return fi in session.cond_outputs or (
                fi in session.consolidated_noncond
                and fi in session.noncond_outputs
            )
        fast_ok = (
            len(order) > 1
            and not clear_nc
            and all(_skip(fi) or fi in session.frames for fi in order)
        )
        if fast_ok:
            # device-cached frames: only never-seen frames transfer bytes;
            # skipped frames map to a dummy row (index 0)
            shape = (self.image_size, self.image_size, 3)
            run_frames = [fi for fi in order if not _skip(fi)]
            images = (
                jnp.stack(
                    [self._device_frame(session, fi) for fi in run_frames]
                )
                if run_frames
                else jnp.zeros((0, *shape), jnp.uint8)
            )
            pos = {fi: i for i, fi in enumerate(run_frames)}
            img_idx = np.asarray([pos.get(fi, 0) for fi in order], np.int32)
            skips = np.asarray([_skip(fi) for fi in order], bool)
            session._feat_cache = None
            session.bank, (masks_t, ptrs_t, scores_t) = (
                self.engine.propagate_window(
                    images, session.bank, np.asarray(order, np.int32), skips,
                    session.num_frames, reverse=reverse,
                    obj_valid=self._active_mask(session),
                    img_idx=img_idx,
                )
            )
            masks_t = np.asarray(masks_t, np.float32)
            ptrs_t = np.asarray(ptrs_t, np.float32)
            scores_t = np.asarray(scores_t, np.float32)
            valid_row = self._active_mask(session)
            for i, frame_idx in enumerate(order):
                if _skip(frame_idx):
                    store = (
                        session.cond_outputs
                        if frame_idx in session.cond_outputs
                        else session.noncond_outputs
                    )
                    pred_masks = np.asarray(
                        store[frame_idx]["pred_masks"], np.float32
                    )
                else:
                    pred_masks = masks_t[i]
                    session.noncond_outputs[frame_idx] = {
                        "pred_masks": pred_masks.astype(np.float16),
                        "obj_ptr": ptrs_t[i],
                        "object_score_logits": scores_t[i],
                        "valid": valid_row.copy(),
                    }
                session.frames_already_tracked[frame_idx] = {
                    "reverse": reverse
                }
                yield frame_idx, session.obj_ids, self._video_res_masks(
                    session, pred_masks
                )
            return

        # Phase 1: dispatch every step asynchronously (device round-trips
        # over the accelerator link dominate per-frame latency; batching the
        # downloads turns ~6 transfers/frame into ~1 per window). The fused
        # stream_step uploads the fp16 frame and runs encode+track in one
        # dispatch; the MemoryBank chains on-device through donation.
        active = self._active_mask(session)
        device_outs: list = []  # (frame_idx, out_dict_or_None, pred_masks_np)
        for frame_idx in processing_order:
            if frame_idx in session.cond_outputs:
                out = session.cond_outputs[frame_idx]
                device_outs.append((frame_idx, None, out["pred_masks"]))
                if self.clear_non_cond_mem_around_input and (
                    self.clear_non_cond_mem_for_multi_obj
                    or session.num_objects <= 1
                ):
                    self._clear_non_cond_mem_around_input(session, frame_idx)
            elif (
                frame_idx in session.consolidated_noncond
                and frame_idx in session.noncond_outputs
            ):
                # only *prompted* non-cond frames are reused; ordinary tracked
                # frames are re-inferred on revisit (reference :975-996) —
                # this is how overlapping reverse windows refine each frame
                device_outs.append(
                    (frame_idx, None,
                     session.noncond_outputs[frame_idx]["pred_masks"])
                )
            else:
                if frame_idx not in session.frames:
                    raise KeyError(f"frame {frame_idx} is not available")
                session._feat_cache = None  # features are fused into the step
                session.bank, out = self.engine.stream_step(
                    self._device_frame(session, frame_idx)[None],
                    session.bank, frame_idx,
                    num_frames, reverse=reverse, obj_valid=active,
                )
                device_outs.append((frame_idx, out, None))

        # Phase 2: one bulk download, then store + yield
        fetched = jax.device_get(
            [o for _, o, _ in device_outs if o is not None]
        )
        it = iter(fetched)
        for frame_idx, out, pred_masks in device_outs:
            if out is not None:
                host_out = next(it)
                masks_np = np.asarray(host_out["pred_masks"], np.float32)
                session.noncond_outputs[frame_idx] = {
                    "pred_masks": masks_np.astype(np.float16),
                    "obj_ptr": np.asarray(host_out["obj_ptr"], np.float32),
                    "object_score_logits": np.asarray(
                        host_out["object_score_logits"], np.float32
                    ),
                    "valid": self._active_mask(session),
                }
                pred_masks = masks_np
            session.frames_already_tracked[frame_idx] = {"reverse": reverse}
            video_res_masks = self._video_res_masks(
                session, np.asarray(pred_masks, np.float32)
            )
            yield frame_idx, session.obj_ids, video_res_masks

    def _clear_non_cond_mem_around_input(self, session, frame_idx: int):
        """(reference :1551-1571)"""
        r = self.cfg.memory_temporal_stride_for_eval
        radius = r * self.cfg.num_maskmem
        session.bank = bank_ops.clear_noncond_around(
            session.bank, jnp.int32(frame_idx), jnp.int32(radius)
        )
        lo, hi = frame_idx - radius, frame_idx + radius
        for t in list(session.noncond_outputs):
            if lo <= t <= hi:
                session.noncond_outputs.pop(t, None)

    # ------------------------------------------------------------------
    # memory management
    # ------------------------------------------------------------------

    def release_old_frames(
        self,
        session: InferenceSession,
        frame_idx: int,
        max_inference_state_frames: int,
        pre_frames: Optional[int] = None,
        release_images: bool = False,
    ) -> None:
        """Constant-memory eviction (fork, :1215-1277): drop outputs/frames
        with pre_frames-1 < idx <= frame_idx - max_inference_state_frames."""
        pre_frames = session.pre_frames if pre_frames is None else pre_frames
        oldest_allowed = frame_idx - max_inference_state_frames

        def _in_range(idx):
            return (pre_frames - 1) < idx <= oldest_allowed

        for store in (session.cond_outputs, session.noncond_outputs):
            for t in [t for t in store if _in_range(t)]:
                store.pop(t, None)
        session.consolidated_noncond = {
            t for t in session.consolidated_noncond if not _in_range(t)
        }
        for t in [t for t in session._empty_ptr if _in_range(t)]:
            session._empty_ptr.pop(t, None)
        # frames_already_tracked is NOT dropped (the reference keeps
        # frames_tracked forever, :1215-1277: a later correction on a
        # released frame must still classify as tracked, not init) — but a
        # per-frame dict grows forever on endless streams, so released
        # entries compact into merged (start, end, reverse) ranges
        session.compact_tracked(oldest_allowed)
        if session.bank is not None:
            session.bank = bank_ops.release_frames(
                session.bank, jnp.int32(oldest_allowed + 1)
            )
            self._refresh_cond_bucket(session)
        if release_images:
            for t in [t for t in session.frames if _in_range(t)]:
                session.frames.pop(t, None)
            for t in [t for t in session.frames_dev if _in_range(t)]:
                session.frames_dev.pop(t, None)
            if session._feat_cache and _in_range(session._feat_cache[0]):
                session._feat_cache = None

    # ------------------------------------------------------------------
    # preload memory bank (save / restore across videos)
    # ------------------------------------------------------------------

    def save_session(self, session: InferenceSession, path: str) -> None:
        """Serialize the full session (the fork pickles `inference_state`,
        det_sam2_RT.py:489-503).

        Prompts added since the last propagation live only in the temp
        stores (and would otherwise be silently dropped): consolidate them
        into the bank/outputs first — exactly what the next
        propagate_in_video would do."""
        if any(per_frame
               for store in (session.temp_cond, session.temp_noncond)
               for per_frame in store.values()):
            self.propagate_in_video_preflight(session)
        payload = {
            "cfg_image_size": self.image_size,
            "video_height": session.video_height,
            "video_width": session.video_width,
            "num_frames": session.num_frames,
            "obj_id_to_idx": dict(session.obj_id_to_idx),
            # banked-attention caches are DERIVED state (projections of
            # the stored memories) and large — strip them from the payload
            # and rebuild on load
            "bank": None
            if session.bank is None
            else jax.tree_util.tree_map(
                np.asarray,
                session.bank.replace(mem_k=None, mem_v=None),
            ),
            "bank_objs": session.bank_objs,
            "cond_outputs": session.cond_outputs,
            "noncond_outputs": session.noncond_outputs,
            "frames_already_tracked": session.frames_already_tracked,
            "tracked_ranges": session.tracked_ranges,
            "frames": (
                session.frames.materialized()
                if isinstance(session.frames, _LazyFrames)
                else session.frames
            ),
            "pre_frames": session.pre_frames,
            "preload_cond_indices": session.preload_cond_indices,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_session_as_preload(self, path: str, keep_images: bool = True
                                ) -> InferenceSession:
        """Load a saved session as a preload memory bank for a NEW video:
        all existing cond frames become pinned preload frames
        (init_preloading_state, sam2_video_predictor.py:123-156 + run()
        wiring det_sam2_RT.py:538-549)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        assert payload["cfg_image_size"] == self.image_size
        session = InferenceSession(
            self.cfg, payload["video_height"], payload["video_width"]
        )
        session.num_frames = payload["num_frames"]
        for oid, oidx in sorted(
            payload["obj_id_to_idx"].items(), key=lambda kv: kv[1]
        ):
            session.obj_id_to_idx[oid] = oidx
            session.obj_idx_to_id[oidx] = oid
        session.bank_objs = payload["bank_objs"]
        if payload["bank"] is not None:
            bank = jax.tree_util.tree_map(jnp.asarray, payload["bank"])
            # pin every cond slot so preload memories survive eviction and
            # always join memory attention (sam2_utils.py:56-60)
            bank = bank.replace(cond_pinned=bank.cond_frame_idx >= 0)
            bank = self.engine.attach_bank_caches(bank)
            session.bank = bank
        session.cond_outputs = payload["cond_outputs"]
        session.noncond_outputs = payload["noncond_outputs"]
        session.frames_already_tracked = payload["frames_already_tracked"]
        # migrate pre-seq 3-tuple payloads to (s, e, rev, seq)
        session.tracked_ranges = [
            tuple(r) if len(r) == 4 else (*r, 0)
            for r in payload.get("tracked_ranges", [])
        ]
        session._compact_seq = max(
            (r[3] for r in session.tracked_ranges), default=0
        )
        if keep_images:
            session.frames = payload["frames"]
        session.pre_frames = session.num_frames
        session.preload_cond_indices = sorted(session.cond_outputs.keys())
        session.tracking_has_started = True
        self._refresh_cond_bucket(session)
        return session

    # ------------------------------------------------------------------
    # object / prompt removal
    # ------------------------------------------------------------------

    def remove_object(self, session: InferenceSession, obj_id: int):
        """Deactivate an object slot (reference compacts slots :1437-1535;
        padded slots let us simply blank the row)."""
        if obj_id not in session.obj_id_to_idx:
            return session.obj_ids
        obj_idx = session.obj_id_to_idx.pop(obj_id)
        session.obj_idx_to_id.pop(obj_idx, None)
        session.point_inputs_per_obj.pop(obj_idx, None)
        session.mask_inputs_per_obj.pop(obj_idx, None)
        session.temp_cond.pop(obj_idx, None)
        session.temp_noncond.pop(obj_idx, None)
        for store in (session.cond_outputs, session.noncond_outputs):
            for out in store.values():
                if obj_idx < len(out["valid"]):
                    out["valid"][obj_idx] = False
                    out["pred_masks"][obj_idx] = NO_OBJ_SCORE
        if session.bank is not None:
            # blank this slot's bank rows so a later object reusing the slot
            # (see _obj_id_to_idx) never attends stale memories
            session.bank = bank_ops.clear_object_rows(session.bank, obj_idx)
        return session.obj_ids

    def clear_all_prompts_in_frame(
        self, session: InferenceSession, frame_idx: int, obj_id: int
    ) -> None:
        """(reference :1060-1131: remove prompts; demote cond output)"""
        obj_idx = session.obj_id_to_idx.get(obj_id)
        if obj_idx is None:
            return
        session.point_inputs_per_obj[obj_idx].pop(frame_idx, None)
        session.mask_inputs_per_obj[obj_idx].pop(frame_idx, None)
        session.temp_cond[obj_idx].pop(frame_idx, None)
        session.temp_noncond[obj_idx].pop(frame_idx, None)
        still_prompted = any(
            frame_idx in session.point_inputs_per_obj[i]
            or frame_idx in session.mask_inputs_per_obj[i]
            for i in session.obj_idx_to_id
        )
        if not still_prompted:
            # reference :1090-1094: the frame leaves the consolidated set
            # (so propagation re-infers it instead of reusing the cleared
            # correction forever)
            session.consolidated_noncond.discard(frame_idx)
            if frame_idx in session.cond_outputs:
                out = session.cond_outputs.pop(frame_idx)
                session.noncond_outputs[frame_idx] = out
                # demoted cond frames are no longer "tracked": a fresh
                # prompt on them must be treated as an init cond frame
                # (reference pops frames_already_tracked on demotion)
                session.frames_already_tracked.pop(frame_idx, None)
                if session.bank is not None:
                    session.bank = bank_ops.demote_cond_frame(
                        session.bank, jnp.int32(frame_idx)
                    )
                    self._refresh_cond_bucket(session)
            if not session.cond_outputs:
                # no conditioning frames remain anywhere: the reference
                # resets ALL tracking results (keeping registered objects)
                self._reset_tracking_results(session)

    def _reset_tracking_results(self, session: InferenceSession) -> None:
        """Reference _reset_tracking_results: clear every tracking input
        and output but KEEP the registered objects."""
        for v in session.point_inputs_per_obj.values():
            v.clear()
        for v in session.mask_inputs_per_obj.values():
            v.clear()
        for v in session.temp_cond.values():
            v.clear()
        for v in session.temp_noncond.values():
            v.clear()
        session.cond_outputs.clear()
        session.noncond_outputs.clear()
        session.consolidated_noncond.clear()
        session.frames_already_tracked.clear()
        session.tracked_ranges.clear()
        session.tracking_has_started = False
        session._empty_ptr.clear()
        # drop all bank memories: objects stay registered, so keep the
        # allocation sized for them (a fresh prompt goes straight in);
        # preload state lives in the bank, so it goes too
        if session.bank is not None:
            session.bank = bank_ops.init_bank(
                self.cfg, session.bank_objs, dtype=self.engine.dtype,
                banked_layers=self.engine.banked_layers,
            )
            self._refresh_cond_bucket(session)
        session.pre_frames = 0
        session.preload_cond_indices = []
        session._feat_cache = None
