"""BatchedVideoStreamer: lockstep tracking of B independent video streams.

TPU-native multi-stream serving: instead of running B videos as B
sequential single-video sessions (B× the dispatches, B× the per-op
floors), the streamer owns ONE merged MemoryBank whose object axis is
the concatenation of every video's objects (video v owns the contiguous
row group ``sum(counts[:v]) .. +counts[v]``) and drives
``SAM2Engine.propagate_window_batched``: each scan step encodes B frames
as one batched trunk call and the per-object memory machinery — which
already reproduces the reference's per-object dicts via per-(slot,object)
validity (sam2_video_predictor.py:1437-1535 object addition) — keeps
every video's read/write exact.

Reference scope: the reference serves one video per predictor session
(demo/backend/server/inference/predictor.py) and its Det-SAM2 pipeline
processes one stream (det_sam2_inference/det_sam2_RT.py); this module is
a deliberate capability EXTENSION for TPU serving, not a parity item.

Lockstep contract (v1):
  * all videos share one frame clock: step t of a window is frame
    ``frame_indices[t]`` of EVERY video;
  * prompts are init prompts (``is_init=True``); mid-stream correction
    clicks on already-tracked frames are not supported batched — run
    those videos in their own session;
  * ``non_overlap_masks_for_mem_enc`` must be off (it is off in every
    reference config) — it would couple objects across videos.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from det_sam2_tpu import state as bank_ops
from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.track import SAM2Engine


class BatchedVideoStreamer:
    """Drives B videos through one merged-bank engine in lockstep.

    counts: per-video object counts (static). The merged bank has
    ``sum(counts)`` object rows; per-video outputs are recovered with
    :meth:`split`.
    """

    def __init__(self, engine: SAM2Engine, counts: Sequence[int]):
        cfg: SAM2Config = engine.cfg
        if cfg.non_overlap_masks_for_mem_enc and len(counts) > 1:
            raise NotImplementedError(
                "non_overlap_masks_for_mem_enc couples objects across "
                "videos; disable it for batched streaming"
            )
        self.engine = engine
        self.cfg = cfg
        self.counts: Tuple[int, ...] = tuple(int(c) for c in counts)
        if any(c <= 0 for c in self.counts):
            raise ValueError(f"every video needs >=1 object: {self.counts}")
        self.num_videos = len(self.counts)
        self.num_objects = int(sum(self.counts))
        self.row_offsets = np.concatenate(
            [[0], np.cumsum(self.counts)]
        ).astype(int)
        self.bank = bank_ops.init_bank(
            cfg, self.num_objects, dtype=engine.dtype, attend_cond_tiles=1,
            banked_layers=engine.banked_layers,
        )
        # distinct prompted frame indices, per video and union — the cond
        # tile attend-set is selected GLOBALLY by frame distance
        # (state.select_memory top_k over shared cond_frame_idx) with
        # per-object validity masking, so the tile count must cover the
        # union of live prompt frames or a video whose cond frame falls
        # outside the selected tiles would lose its conditioning.
        self.prompt_frames: List[set] = [set() for _ in self.counts]

    # ------------------------------------------------------------------

    def _rows(self, video: int) -> slice:
        return slice(self.row_offsets[video], self.row_offsets[video + 1])

    def _refresh_cond_tiles(self) -> None:
        live = len(set().union(*self.prompt_frames)) or 1
        b = bank_ops.cond_tile_bucket(self.cfg, live)
        if b != self.bank.attend_cond_tiles:
            self.bank = self.bank.replace(attend_cond_tiles=b)

    def encode_frames(self, frames: np.ndarray):
        """frames [B, H, W, 3] uint8 at model resolution -> batched
        feature tuple (one trunk dispatch for all B videos)."""
        if frames.shape[0] != self.num_videos:
            raise ValueError(
                f"expected {self.num_videos} frames, got {frames.shape[0]}"
            )
        return self.engine.encode_image(jnp.asarray(frames))

    def add_prompts(
        self,
        frame_idx: int,
        num_frames: int,
        frames: np.ndarray,
        prompts: Dict[int, Tuple[np.ndarray, np.ndarray]],
        feats=None,
    ) -> Dict[int, dict]:
        """Init-prompt a subset of videos at one shared frame index.

        frames [B, H, W, 3] uint8 (every video's frame at ``frame_idx``;
        un-prompted videos' frames are only used as inert feature rows
        for the masked cond write). prompts maps video -> (points
        [O_v, P, 2] px, labels [O_v, P]); box prompts use the usual
        corner labels (2, 3), pad rows use label -1. Returns the raw
        prompt outputs per video.

        prompt_step runs PER VIDEO (not merged) so ``use_multimask``
        gating by that video's point count stays exactly the
        single-session behavior; the cond-bank write is one merged
        ``encode_cond_memory`` with only the prompted videos' rows valid.
        """
        if not prompts:
            # An empty call would still burn a cond slot (all rows invalid)
            # that select_memory's frame-level top-k can pick over a REAL
            # cond frame when tiles are tight — refuse it outright.
            raise ValueError(
                "add_prompts called with an empty prompts dict; prompt at "
                "least one video or skip the call"
            )
        bad = set(prompts) - set(range(self.num_videos))
        if bad:
            raise ValueError(f"unknown video ids {sorted(bad)}")
        for v, (pts, labels) in prompts.items():
            if pts.shape[0] != self.counts[v]:
                raise ValueError(
                    f"video {v}: {pts.shape[0]} prompt rows for "
                    f"{self.counts[v]} objects"
                )
        # The cond attend-tile set is selected globally by frame distance
        # with at most min(cond_attn_size, cond_bank_size) tiles; if the
        # union of live prompt frames exceeds that (or the bank capacity,
        # where _choose_write_slot evicts the temporally furthest slot), a
        # video's only cond frame silently falls out of the attended/stored
        # set and it loses all conditioning. Fail loudly instead.
        cap = min(self.cfg.cond_attn_size, self.cfg.cond_bank_size)
        union = set().union(*self.prompt_frames) | {int(frame_idx)}
        if len(union) > cap:
            raise ValueError(
                f"{len(union)} distinct prompt frames across videos exceed "
                f"the {cap} cond tiles this bank can attend/store "
                f"(min(cond_attn_size={self.cfg.cond_attn_size}, "
                f"cond_bank_size={self.cfg.cond_bank_size})); split the "
                f"videos across sessions"
            )
        if feats is None:
            feats = self.encode_frames(frames)

        cfg = self.cfg
        s4 = cfg.image_size // 4
        low = np.zeros((self.num_objects, 1, s4, s4), np.float32)
        logits = np.zeros((self.num_objects, 1), np.float32)
        ptr = np.zeros((self.num_objects, cfg.hidden_dim), np.float32)
        valid = np.zeros((self.num_objects,), bool)
        outs: Dict[int, dict] = {}
        for v, (pts, labels) in sorted(prompts.items()):
            feats_v = tuple(f[v : v + 1] for f in feats)
            out = self.engine.prompt_step(
                feats_v, self.bank, frame_idx, num_frames,
                jnp.asarray(pts, jnp.float32), jnp.asarray(labels, jnp.int32),
                is_init=True,
            )
            rows = self._rows(v)
            low[rows] = np.asarray(out["pred_masks"], np.float32)
            logits[rows] = np.asarray(out["object_score_logits"], np.float32)
            ptr[rows] = np.asarray(out["obj_ptr"], np.float32)
            valid[rows] = True
            outs[v] = out
            self.prompt_frames[v].add(int(frame_idx))

        # Sequential add_prompts calls at the SAME frame for different video
        # subsets must not clobber each other: write_cond slot-matches the
        # existing cond slot and replaces mem/ptr/obj_valid wholesale, so
        # snapshot the rows of videos already prompted at this frame (but
        # not re-prompted now) and restore them after the merged write.
        keep_rows = np.zeros((self.num_objects,), bool)
        for v in range(self.num_videos):
            if v not in prompts and int(frame_idx) in self.prompt_frames[v]:
                keep_rows[self._rows(v)] = True
        old_slot = None
        if keep_rows.any():
            hits = np.where(
                np.asarray(self.bank.cond_frame_idx) == int(frame_idx)
            )[0]
            if hits.size:  # guaranteed by the cap check above
                s = int(hits[0])
                old_slot = (
                    self.bank.cond_mem[s],
                    self.bank.cond_ptr[s],
                    self.bank.cond_obj_valid[s],
                    None if self.bank.mem_k is None else self.bank.mem_k[s],
                    None if self.bank.mem_v is None else self.bank.mem_v[s],
                )

        counts_arr = jnp.asarray(np.asarray(self.counts, np.int32))
        feat_rows = tuple(
            jnp.repeat(f, counts_arr, axis=0,
                       total_repeat_length=self.num_objects)
            for f in feats
        )
        self._refresh_cond_tiles()
        self.bank = self.engine.encode_cond_memory(
            feat_rows, self.bank, frame_idx, low, logits, ptr,
            is_mask_from_pts=True, obj_valid=valid,
        )
        if old_slot is not None:
            old_mem, old_ptr, old_valid, old_mk, old_mv = old_slot
            sel = jnp.asarray(keep_rows)
            bank = self.bank
            kw = {}
            if old_mk is not None:
                # cond slot s maps to unified cache row s (state.py layout)
                kw["mem_k"] = bank.mem_k.at[s].set(
                    jnp.where(sel[:, None, None, None], old_mk,
                              bank.mem_k[s])
                )
                kw["mem_v"] = bank.mem_v.at[s].set(
                    jnp.where(sel[:, None, None], old_mv, bank.mem_v[s])
                )
            self.bank = bank.replace(
                cond_mem=bank.cond_mem.at[s].set(
                    jnp.where(sel[:, None, None], old_mem, bank.cond_mem[s])
                ),
                cond_ptr=bank.cond_ptr.at[s].set(
                    jnp.where(sel[:, None], old_ptr, bank.cond_ptr[s])
                ),
                cond_obj_valid=bank.cond_obj_valid.at[s].set(
                    bank.cond_obj_valid[s] | (sel & old_valid)
                ),
                **kw,
            )
        return outs

    # ------------------------------------------------------------------

    def propagate_window(
        self,
        frames: np.ndarray,
        frame_indices: Sequence[int],
        num_frames: int,
        reverse: bool = False,
        obj_valid: Optional[np.ndarray] = None,
    ):
        """Track one lockstep window.

        frames [T, B, H, W, 3] uint8; frame_indices [T] shared clock.
        Steps that are prompted frames for a video are skipped for THAT
        video (zeros in its output rows — reuse the stored prompt
        outputs); steps prompted for EVERY video upload nothing and run
        nothing. Returns (pred_masks [T, O_total, 1, s4, s4] fp16,
        obj_ptr [T, O_total, C], object_score_logits [T, O_total, 1],
        skips [T, B]); split the object axis with :meth:`split`.
        """
        frame_indices = np.asarray(frame_indices, np.int32)
        t = len(frame_indices)
        if frames.shape[:2] != (t, self.num_videos):
            raise ValueError(
                f"frames {frames.shape[:2]} != (T={t}, B={self.num_videos})"
            )
        skips = np.zeros((t, self.num_videos), bool)
        for v in range(self.num_videos):
            for i, f in enumerate(frame_indices):
                if int(f) in self.prompt_frames[v]:
                    skips[i, v] = True
        run = ~skips.all(axis=1)  # steps where at least one video runs
        img_idx = np.zeros((t,), np.int32)
        img_idx[run] = np.arange(int(run.sum()), dtype=np.int32)
        images = np.asarray(frames)[run]
        new_bank, (low, ptr, logits) = self.engine.propagate_window_batched(
            images, self.bank, frame_indices, skips, num_frames,
            self.counts, reverse=reverse, obj_valid=obj_valid,
            img_idx=img_idx,
        )
        self.bank = new_bank
        return low, ptr, logits, skips

    def split(self, stacked, axis: int = 1):
        """Split the merged object axis into per-video arrays. Window
        outputs are [T, O_total, ...] (axis=1, the default); pass axis=0
        for single-frame [O_total, ...] arrays."""
        if stacked.shape[axis] != self.num_objects:
            raise ValueError(
                f"axis {axis} has {stacked.shape[axis]} rows, expected "
                f"{self.num_objects}"
            )
        return [
            jnp.take(
                stacked,
                jnp.arange(self.row_offsets[v], self.row_offsets[v + 1]),
                axis=axis,
            )
            for v in range(self.num_videos)
        ]
