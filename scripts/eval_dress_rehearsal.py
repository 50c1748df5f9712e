"""Weights-day dress rehearsal: the FULL real-weights serving chain, end to
end, on a synthetic reference-format checkpoint.

Every piece of the weights-day path is unit-tested separately
(tests/test_convert.py, test_eval_driver.py, test_eval_gate.py); this script
proves the CHAIN as one run, so the only untested step left on weights day is
the download itself:

  1. init a random VLM tree and EXPORT it to the reference's exact weight-dump
     layout (models/export.export_*_full — inverse of models/convert.py):
       workdir/weights/vision_model.pth                HF CLIPVisionModel sd
       workdir/weights/multi_modal_projector.pth       Phi3_5_Projecter sd
       workdir/weights/image_newlines.pth              glb_GN/sub_GN
       workdir/weights/language_model_seperated/*.bin  HF causal-LM sd
       workdir/video_encoder.pt                        InternVideo2 {"model": sd}
       workdir/stage_grounded.pth                      split-by-module stage ckpt
                                                       ({"model": {module: sd}},
                                                       reference fsdp.py:116-127)
  2. reload through the REAL load path (cli/model_loading.build_params:
     torch.load → models/convert.py → int8 quantize-on-upload) and assert the
     bf16 tree ROUNDTRIPS the source exactly (pos_embed included — the micro
     config's 4-frame table matches the f4 default, no interpolation).
  3. synthesize 5 Charades-STA-format items (cv2-written mp4s + the
     "VIDEOID START END##query" annotation file the real eval consumes).
  4. run eval.py EXACTLY as weights day will (subprocess, NO
     --allow_random_weights — the weights gate must pass on the real files),
     with --quantize int8_full, and collect the BASELINE.md-format metrics
     JSON (R1@0.3/0.5/0.7 + mIoU).
  5. write the combined artifact (EVAL_DRYRUN_r05.json at repo root when run
     with --artifact).

Random weights make the METRIC VALUES meaningless — what this certifies is
that the chain executes: gate → load → convert → quantize → engine → decode →
interval parse → scorer → JSON. Matches the reference's eval entry
(/root/reference/inference.py:137-186 load order; README.md:31-34 metrics).

Usage: python scripts/eval_dress_rehearsal.py [--workdir DIR] [--artifact]
       [--items N] [--max_new_tokens N] [--skip_eval]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_weight_dumps(workdir: str) -> dict:
    """Init the micro VLM and write every reference-format dump. Returns
    {"paths": ..., "roundtrip_ok": bool, "n_tensors": int}."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from grounded_video_llm_tpu.core.config import micro_vlm_config
    from grounded_video_llm_tpu.models import export as ex
    from grounded_video_llm_tpu.models import vlm

    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)

    wroot = os.path.join(workdir, "weights")
    lm_dir = os.path.join(wroot, "language_model_seperated")
    os.makedirs(lm_dir, exist_ok=True)

    def save(path, sd):
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
        return path

    clip_sd = ex.export_clip_full(params["clip"], cfg.clip)
    llm_sd = ex.export_llm_full(params["llm"], cfg.llm)
    iv2_sd = ex.export_internvideo2_full(params["video_encoder"], cfg.video)
    paths = {
        "vision_model": save(os.path.join(wroot, "vision_model.pth"), clip_sd),
        "multi_modal_projector": save(
            os.path.join(wroot, "multi_modal_projector.pth"),
            ex.export_mm_projector(params["mm_projector"], cfg.llm_name)),
        "image_newlines": save(os.path.join(wroot, "image_newlines.pth"),
                               ex.export_extras_full(params["extras"],
                                                     cfg.llm_name)),
        "language_model": save(
            os.path.join(lm_dir, "pytorch_model-00001-of-00001.bin"), llm_sd),
    }
    # InternVideo2 release wraps the sd in {"model": ...}
    iv2_path = os.path.join(workdir, "video_encoder.pt")
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in iv2_sd.items()}}, iv2_path)
    paths["video_encoder"] = iv2_path
    # stage checkpoint: the reference's split-by-module trainable dump
    stage_path = os.path.join(workdir, "stage_grounded.pth")
    ex.export_vlm_to_reference(params, cfg, stage_path, trainable_only=False)
    paths["stage_ckpt"] = stage_path

    # ---- roundtrip: the REAL load path must reproduce the source tree ----
    from grounded_video_llm_tpu.cli.model_loading import build_params

    loaded = build_params(cfg, weight_root=wroot,
                          video_encoder_path=iv2_path,
                          stage_ckpt=stage_path, dtype=jnp.bfloat16)
    want = jax.tree_util.tree_map(
        lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32),
        params)
    got = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), loaded)
    mismatches = []

    def cmp(path, a, b):
        if a.shape != b.shape or not np.allclose(a, b, rtol=0, atol=0):
            mismatches.append(path)

    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = {jax.tree_util.keystr(kp): leaf for kp, leaf
              in jax.tree_util.tree_flatten_with_path(got)[0]}
    for kp, a in flat_w:
        cmp(jax.tree_util.keystr(kp), a, flat_g[jax.tree_util.keystr(kp)])
    n_tensors = len(clip_sd) + len(llm_sd) + len(iv2_sd)
    return {"paths": paths, "roundtrip_ok": not mismatches,
            "roundtrip_mismatches": mismatches, "n_tensors": n_tensors}


def write_charades_items(workdir: str, n_items: int) -> dict:
    """n_items synthetic clips + a charades_sta-format annotation file
    ("VIDEOID START END##query", the real eval's --anno_format)."""
    import cv2
    import numpy as np

    video_dir = os.path.join(workdir, "videos")
    os.makedirs(video_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    queries = ["person opens a door", "a car drives past", "someone sits down",
               "person picks up a cup", "a dog runs across the yard"]
    for i in range(n_items):
        vid = f"DRYRUN{i}"
        path = os.path.join(video_dir, vid + ".mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                            (64, 64))
        for f in range(48):
            frame = rng.integers(0, 80, size=(64, 64, 3)).astype(np.uint8)
            x = (f * 2 + 7 * i) % 56
            frame[20:40, x:x + 8] = (255, 128 + 10 * i, 64)
            w.write(frame)
        w.release()
        start = round(float(rng.uniform(0.5, 2.0)), 1)
        end = round(start + float(rng.uniform(1.0, 3.0)), 1)
        lines.append(f"{vid} {start} {end}##{queries[i % len(queries)]}")
    anno_path = os.path.join(workdir, "charades_sta_dryrun.txt")
    with open(anno_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"anno_path": anno_path, "video_root": video_dir,
            "n_items": n_items}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gvllm_dress_rehearsal")
    ap.add_argument("--items", type=int, default=5)
    ap.add_argument("--max_new_tokens", type=int, default=16)
    ap.add_argument("--artifact", action="store_true",
                    help="write EVAL_DRYRUN_r05.json at the repo root")
    ap.add_argument("--skip_eval", action="store_true",
                    help="export + roundtrip + data synth only (CPU-fast)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    t0 = time.time()
    dumps = write_weight_dumps(args.workdir)
    t_export = time.time() - t0
    print(f"export+roundtrip: {t_export:.1f}s, {dumps['n_tensors']} tensors, "
          f"roundtrip_ok={dumps['roundtrip_ok']}", file=sys.stderr)
    if not dumps["roundtrip_ok"]:
        print(f"ROUNDTRIP MISMATCHES: {dumps['roundtrip_mismatches']}",
              file=sys.stderr)

    data = write_charades_items(args.workdir, args.items)
    print(f"synthesized {data['n_items']} Charades-format items",
          file=sys.stderr)

    result = {
        "mode": "weights_day_dress_rehearsal",
        "date": time.strftime("%Y-%m-%d"),
        "roundtrip_ok": dumps["roundtrip_ok"],
        "n_tensors_exported": dumps["n_tensors"],
        "export_roundtrip_s": round(t_export, 1),
        "weights_gate_requires": ["ckpt_path", "pretrained_video_path",
                                  "pretrained_vision_proj_llm_path"],
        "note": "random weights; metric VALUES are meaningless — this "
                "certifies the chain gate->load->convert->int8-upload->"
                "engine->decode->parse->scorer->JSON executes",
    }

    if not args.skip_eval:
        out_json = os.path.join(args.workdir, "eval_metrics.json")
        cmd = [sys.executable, os.path.join(REPO, "eval.py"),
               "--benchmark", "grounding",
               "--anno_path", data["anno_path"],
               "--anno_format", "charades_sta",
               "--video_root", data["video_root"],
               "--ckpt_path", dumps["paths"]["stage_ckpt"],
               "--pretrained_video_path", dumps["paths"]["video_encoder"],
               "--pretrained_vision_proj_llm_path",
               os.path.join(args.workdir, "weights"),
               "--quantize", "int8_full",
               "--debug_tiny",
               "--max_new_tokens", str(args.max_new_tokens),
               "--batch_size", "2",
               "--out", out_json]
        # NO --allow_random_weights: the weights gate must pass on the files
        t1 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=REPO, timeout=3000)
        t_eval = time.time() - t1
        print(proc.stderr[-2000:], file=sys.stderr)
        if proc.returncode != 0:
            print(proc.stdout[-2000:], file=sys.stderr)
            raise SystemExit(f"eval.py failed rc={proc.returncode}")
        with open(out_json) as f:
            metrics = json.load(f)
        result.update({
            "eval_s": round(t_eval, 1),
            "eval": metrics,
            "baseline_md_row": "Charades-STA R1@0.3 / R1@0.5 / R1@0.7 / mIoU",
        })
        print(f"eval.py chain: {t_eval:.1f}s, metrics="
              f"{metrics.get('metrics')}", file=sys.stderr)

        # captioning leg: the OTHER BASELINE.md metric family (ActivityNet-
        # Captions SODA_c/METEOR) through the same checkpoint + weights gate
        vids = sorted(os.path.splitext(v)[0]
                      for v in os.listdir(data["video_root"]))[:2]
        cap_annos = {v: {"duration": 6.0,
                         "timestamps": [[0.0, 3.0], [3.0, 6.0]],
                         "sentences": ["a shape moves across the frame",
                                       "the shape leaves the frame"]}
                     for v in vids}
        cap_anno_path = os.path.join(args.workdir, "anet_captions_dryrun.json")
        with open(cap_anno_path, "w") as f:
            json.dump(cap_annos, f)
        cap_json = os.path.join(args.workdir, "eval_captioning.json")
        cap_cmd = list(cmd)
        cap_cmd[cap_cmd.index("--benchmark") + 1] = "captioning"
        cap_cmd[cap_cmd.index("--anno_path") + 1] = cap_anno_path
        cap_cmd[cap_cmd.index("--anno_format") + 1] = "json"
        cap_cmd[cap_cmd.index("--out") + 1] = cap_json
        t2 = time.time()
        proc = subprocess.run(cap_cmd, capture_output=True, text=True,
                              cwd=REPO, timeout=3000)
        if proc.returncode != 0:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"eval.py captioning failed rc={proc.returncode}")
        with open(cap_json) as f:
            cap_metrics = json.load(f)
        result.update({
            "eval_captioning_s": round(time.time() - t2, 1),
            "eval_captioning": cap_metrics,
            "baseline_md_row_captioning":
                "ActivityNet-Captions SODA_c / METEOR",
        })
        print(f"eval.py captioning chain: {time.time()-t2:.1f}s, metrics="
              f"{cap_metrics.get('metrics')}", file=sys.stderr)

    blob = json.dumps(result, indent=1)
    print(blob)
    if args.artifact:
        with open(os.path.join(REPO, "EVAL_DRYRUN_r05.json"), "w") as f:
            f.write(blob + "\n")
    raise SystemExit(0 if dumps["roundtrip_ok"] else 1)


if __name__ == "__main__":
    main()
