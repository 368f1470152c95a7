"""Output subsystem: provenance PNGs, GIF assembly, MP4 encoding.

Reference behaviors: checkin PNG with tEXt metadata (pixray.py:1158-1201),
make_gif (1071-1083), do_video / step_to_video ffmpeg pipes (1640-1715).
Encoding backends are probed in order: ffmpeg binary → imageio-ffmpeg → Pillow
(GIF only); missing backends degrade with a warning instead of failing the run.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess

import numpy as np
from PIL import Image

from pixray_tpu.utils import build_png_info, get_file_path


def save_checkin_png(img: Image.Image, outfile: str, given_args: dict, seed_used):
    img.save(outfile, pnginfo=build_png_info(given_args, seed_used))


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def make_gif(animation_dir: str, fps: int = 10) -> str:
    """Assemble animation_dir/*.png into anim.gif."""
    gif_output = os.path.join(animation_dir, "anim.gif")
    if os.path.exists(gif_output):
        os.remove(gif_output)
    frames = sorted(glob.glob(os.path.join(animation_dir, "*.png")))
    if not frames:
        return gif_output
    if _ffmpeg_available():
        cmd = ["ffmpeg", "-framerate", str(fps), "-pattern_type", "glob",
               "-i", f"{animation_dir}/*.png", "-loop", "0", gif_output]
        try:
            subprocess.check_output(cmd)
        except subprocess.CalledProcessError as cpe:
            print("Ignoring non-zero exit: ", cpe.output)
    else:
        images = [Image.open(f).convert("RGB") for f in frames]
        images[0].save(
            gif_output, save_all=True, append_images=images[1:],
            duration=int(1000 / fps), loop=0,
        )
    return gif_output


def _clip_fps(total_frames: int, length_s: int = 14, min_fps: int = 10, max_fps: int = 60) -> int:
    return int(np.clip(total_frames / length_s, min_fps, max_fps))


def encode_frames_to_mp4(frames: list[Image.Image], output_file: str, fps: int, comment: str = ""):
    """Encode PIL frames to H.264 MP4, trying ffmpeg pipe then imageio-ffmpeg."""
    if _ffmpeg_available():
        cmd = ["ffmpeg", "-y", "-f", "image2pipe", "-vcodec", "png", "-r", str(fps),
               "-i", "-", "-vcodec", "libx264", "-r", str(fps), "-pix_fmt", "yuv420p",
               "-crf", "17", "-preset", "veryslow"]
        if comment:
            cmd += ["-metadata", f"comment={comment}"]
        cmd.append(output_file)
        p = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        for im in frames + [frames[-1]] * fps:
            im.save(p.stdin, "PNG")
        p.stdin.close()
        p.wait()
        return True
    try:
        import imageio

        with imageio.get_writer(output_file, fps=fps) as writer:
            for im in frames + [frames[-1]] * fps:
                writer.append_data(np.asarray(im.convert("RGB")))
        return True
    except Exception as e:  # no encoder available — degrade to GIF
        gif_file = os.path.splitext(output_file)[0] + ".gif"
        print(f"WARNING: no MP4 encoder available ({e}); writing {gif_file} instead")
        frames[0].save(
            gif_file, save_all=True, append_images=frames[1:],
            duration=int(1000 / fps), loop=0,
        )
        return False


def do_video(args, last_iteration: int):
    """Per-iteration frames → output MP4 (reference do_video, pixray.py:1673-1715)."""
    video_folder = os.path.join(args.outdir, "video")
    frames = [
        Image.open(f"{video_folder}/frame_{i:04d}.png")
        for i in range(1, last_iteration)
    ]
    if not frames:
        return
    fps = _clip_fps(len(frames))
    output_file = get_file_path(args.outdir, args.output, ".mp4")
    encode_frames_to_mp4(frames, output_file, fps, comment=str(args.prompts))


def step_to_video(args):
    """Checkin-step frames → steps/output.mp4 (reference step_to_video, 1640-1671)."""
    step_folder = os.path.join(args.outdir, "steps")
    frame_paths = sorted(glob.glob(os.path.join(step_folder, "frame_*.png")))
    if not frame_paths:
        return
    frames = [Image.open(p) for p in frame_paths]
    fps = _clip_fps(len(frames))
    encode_frames_to_mp4(frames, os.path.join(step_folder, "output.mp4"), fps)
