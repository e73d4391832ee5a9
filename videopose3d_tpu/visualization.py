"""Rendering: side-by-side 2D input + 3D reconstruction animations.

Capability parity target: ``/root/reference/common/visualization.py`` — the ffprobe
resolution/fps probes (:17-31), the raw-frame ffmpeg pipe decoder (:33-53),
mean-pooling downsampler (:58-60), and ``render_animation`` (:62-209).

Host-side and not performance-critical; the only changes from the reference
behaviour are (a) ffmpeg/ffprobe are optional — rendering on a black background
works without them, and a clear error is raised if a video path is given on a
machine without ffmpeg; (b) GIF export uses matplotlib's ``pillow`` writer (always
available) instead of requiring imagemagick.
"""

from __future__ import annotations

import shutil
import subprocess as sp

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib.animation import FuncAnimation, writers  # noqa: E402


def _require_ffmpeg(tool: str):
    if shutil.which(tool) is None:
        raise RuntimeError(
            f"{tool} is required for video decoding but was not found on PATH")


def get_resolution(filename):
    """Probe (width, height) of the first video stream via ffprobe."""
    _require_ffmpeg("ffprobe")
    command = ["ffprobe", "-v", "error", "-select_streams", "v:0",
               "-show_entries", "stream=width,height", "-of", "csv=p=0", filename]
    with sp.Popen(command, stdout=sp.PIPE, bufsize=-1) as pipe:
        for line in pipe.stdout:
            w, h = line.decode().strip().split(",")
            return int(w), int(h)


def get_fps(filename):
    """Probe the frame rate of the first video stream via ffprobe."""
    _require_ffmpeg("ffprobe")
    command = ["ffprobe", "-v", "error", "-select_streams", "v:0",
               "-show_entries", "stream=r_frame_rate", "-of", "csv=p=0", filename]
    with sp.Popen(command, stdout=sp.PIPE, bufsize=-1) as pipe:
        for line in pipe.stdout:
            a, b = line.decode().strip().split("/")
            return int(a) / int(b)


def read_video(filename, skip=0, limit=-1):
    """Yield RGB24 frames decoded through an ffmpeg raw-video pipe."""
    _require_ffmpeg("ffmpeg")
    w, h = get_resolution(filename)
    command = ["ffmpeg", "-i", filename, "-f", "image2pipe", "-pix_fmt", "rgb24",
               "-vsync", "0", "-vcodec", "rawvideo", "-"]
    i = 0
    with sp.Popen(command, stdout=sp.PIPE, bufsize=-1) as pipe:
        while True:
            data = pipe.stdout.read(w * h * 3)
            if not data:
                break
            i += 1
            if i > limit and limit != -1:
                continue
            if i > skip:
                yield np.frombuffer(data, dtype="uint8").reshape((h, w, 3))


def downsample_tensor(X, factor):
    """Mean-pool along the leading (time) axis by an integer factor."""
    length = X.shape[0] // factor * factor
    return np.mean(X[:length].reshape(-1, factor, *X.shape[1:]), axis=1)


def render_animation(keypoints, keypoints_metadata, poses, skeleton, fps, bitrate,
                     azim, output, viewport, limit=-1, downsample=1, size=6,
                     input_video_path=None, input_video_skip=0):
    """Render an animation of the 2D input keypoints next to one 3D subplot per
    pose series (e.g. reconstruction + ground truth), with trajectory-following
    3D axes.  Output: ``.mp4`` (ffmpeg writer) or ``.gif`` (pillow writer).
    """
    plt.ioff()
    fig = plt.figure(figsize=(size * (1 + len(poses)), size))
    ax_in = fig.add_subplot(1, 1 + len(poses), 1)
    ax_in.get_xaxis().set_visible(False)
    ax_in.get_yaxis().set_visible(False)
    ax_in.set_axis_off()
    ax_in.set_title("Input")

    ax_3d = []
    lines_3d = []
    trajectories = []
    radius = 1.7
    for index, (title, data) in enumerate(poses.items()):
        ax = fig.add_subplot(1, 1 + len(poses), index + 2, projection="3d")
        ax.view_init(elev=15.0, azim=azim)
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_zlim3d([0, radius])
        ax.set_ylim3d([-radius / 2, radius / 2])
        try:
            ax.set_aspect("equal")
        except NotImplementedError:
            ax.set_aspect("auto")
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])
        try:
            ax.dist = 7.5
        except AttributeError:
            pass  # removed in newer matplotlib
        ax.set_title(title)
        ax_3d.append(ax)
        lines_3d.append([])
        trajectories.append(data[:, 0, [0, 1]])
    poses = list(poses.values())

    if input_video_path is None:
        # Black background behind the keypoint overlay.
        all_frames = np.zeros(
            (keypoints.shape[0], viewport[1], viewport[0]), dtype="uint8")
        if fps is None:
            # Custom (wild) datasets carry no frame rate; without a source
            # video to probe, fall back to a sane default.
            print("INFO: unknown frame rate, assuming 50 FPS")
            fps = 50
    else:
        all_frames = list(read_video(
            input_video_path, skip=input_video_skip, limit=limit))
        effective_length = min(keypoints.shape[0], len(all_frames))
        all_frames = all_frames[:effective_length]

        keypoints = keypoints[input_video_skip:]
        for idx in range(len(poses)):
            poses[idx] = poses[idx][input_video_skip:]
        if fps is None:
            fps = get_fps(input_video_path)

    if downsample > 1:
        keypoints = downsample_tensor(keypoints, downsample)
        all_frames = downsample_tensor(
            np.array(all_frames), downsample).astype("uint8")
        for idx in range(len(poses)):
            poses[idx] = downsample_tensor(poses[idx], downsample)
            trajectories[idx] = downsample_tensor(trajectories[idx], downsample)
        fps /= downsample

    state = {"initialized": False, "image": None, "lines": [], "points": None}

    if limit < 1:
        limit = len(all_frames)
    else:
        limit = min(limit, len(all_frames))

    parents = skeleton.parents()
    joints_right_2d = keypoints_metadata["keypoints_symmetry"][1]
    colors_2d = np.full(keypoints.shape[1], "black", dtype=object)
    colors_2d[joints_right_2d] = "red"
    draw_2d_skeleton = (len(parents) == keypoints.shape[1]
                        and keypoints_metadata["layout_name"] != "coco")

    def update_video(i):
        for n, ax in enumerate(ax_3d):
            ax.set_xlim3d([-radius / 2 + trajectories[n][i, 0],
                           radius / 2 + trajectories[n][i, 0]])
            ax.set_ylim3d([-radius / 2 + trajectories[n][i, 1],
                           radius / 2 + trajectories[n][i, 1]])

        if not state["initialized"]:
            state["image"] = ax_in.imshow(all_frames[i], aspect="equal")
            for j, j_parent in enumerate(parents):
                if j_parent == -1:
                    continue
                if draw_2d_skeleton:
                    state["lines"].append(ax_in.plot(
                        [keypoints[i, j, 0], keypoints[i, j_parent, 0]],
                        [keypoints[i, j, 1], keypoints[i, j_parent, 1]],
                        color="pink"))
                col = "red" if j in skeleton.joints_right() else "black"
                for n, ax in enumerate(ax_3d):
                    pos = poses[n][i]
                    lines_3d[n].append(ax.plot(
                        [pos[j, 0], pos[j_parent, 0]],
                        [pos[j, 1], pos[j_parent, 1]],
                        [pos[j, 2], pos[j_parent, 2]], zdir="z", c=col))
            state["points"] = ax_in.scatter(
                *keypoints[i].T, 10, color=colors_2d, edgecolors="white",
                zorder=10)
            state["initialized"] = True
        else:
            state["image"].set_data(all_frames[i])
            for j, j_parent in enumerate(parents):
                if j_parent == -1:
                    continue
                if draw_2d_skeleton:
                    state["lines"][j - 1][0].set_data(
                        [keypoints[i, j, 0], keypoints[i, j_parent, 0]],
                        [keypoints[i, j, 1], keypoints[i, j_parent, 1]])
                for n, ax in enumerate(ax_3d):
                    pos = poses[n][i]
                    lines_3d[n][j - 1][0].set_xdata(
                        np.array([pos[j, 0], pos[j_parent, 0]]))
                    lines_3d[n][j - 1][0].set_ydata(
                        np.array([pos[j, 1], pos[j_parent, 1]]))
                    lines_3d[n][j - 1][0].set_3d_properties(
                        np.array([pos[j, 2], pos[j_parent, 2]]), zdir="z")
            state["points"].set_offsets(keypoints[i])

        print(f"{i}/{limit}      ", end="\r")

    fig.tight_layout()

    anim = FuncAnimation(fig, update_video, frames=np.arange(0, limit),
                         interval=1000 / fps, repeat=False)
    if output.endswith(".mp4"):
        if "ffmpeg" not in writers.list():
            raise RuntimeError(
                "matplotlib's ffmpeg writer is unavailable (ffmpeg not "
                "installed); use a .gif output instead")
        writer = writers["ffmpeg"](fps=fps, metadata={}, bitrate=bitrate)
        anim.save(output, writer=writer)
    elif output.endswith(".gif"):
        anim.save(output, dpi=80, writer="pillow", fps=int(round(fps)))
    else:
        raise ValueError(
            "Unsupported output format (only .mp4 and .gif are supported)")
    plt.close()
