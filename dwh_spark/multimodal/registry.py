"""Pluggable codec registry — the injection seam for real decoders.

The vendored pure-numpy codecs cover png/bmp/jpeg/gif/tiff and
lossless-webp images, uncompressed + MJPEG AVI video, and
PCM/G.711/ADPCM WAV plus FLAC audio. Real corpora also carry lossy
webp (VP8), HEIC, H.264, MP3 — formats that genuinely need native
libraries (PIL, PyAV/ffmpeg) this sandbox doesn't have. This module is
the documented seam where a deployment plugs those in WITHOUT touching
plan or operator code (the reference's analogue: image.Decode's
format registry that `x/imgresizer/resizer.go:244-255` dispatches
through):

- ``register_image_decoder("heic", fn)`` — ``fn(bytes) -> (H,W,C)
  uint8 ndarray``; ``images.pixel_decoder`` consults this before
  raising for a format the vendored codecs don't cover.
- ``register_video_decoder("MJPG", fn)`` — ``fn(frame_bytes, w, h) ->
  (H,W,3) uint8``; ``codecs.avi_decode_frame`` routes compressed
  ('biCompression' fourcc) frames here before raising.
- ``register_audio_decoder("mp3", fn)`` — ``fn(bytes) -> (n,) float
  ndarray`` of mono samples; reserved for the av.py chunk path.

**Executor-side loading.** A Spark job runs decoders inside executor
Python workers — separate processes where a registration made on the
driver does not exist. The supported pattern is import-time
registration: put ``register_*`` calls at top level of a plugin module
and name it in ``DWH_SPARK_CODEC_PLUGINS`` (comma-separated module
paths, propagated via ``spark.executorEnv``). The registry imports
those modules on first lookup in every process, driver and executor
alike — the same late-binding trick JDBC drivers and Python
entry-points use.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Callable
from threading import Lock

PLUGIN_ENV = "DWH_SPARK_CODEC_PLUGINS"

_image_decoders: dict[str, Callable] = {}
_video_decoders: dict[str, Callable] = {}
_audio_decoders: dict[str, Callable] = {}
_plugins_loaded = False
_lock = Lock()


def register_image_decoder(fmt: str, fn: Callable) -> None:
    """``fn(data: bytes) -> (H, W, C) uint8 ndarray`` for a sniffed
    format name (images._MAGICS vocabulary: tiff, webp, ...)."""
    _image_decoders[fmt.lower()] = fn


def register_video_decoder(fourcc: str, fn: Callable) -> None:
    """``fn(frame_bytes: bytes, width: int, height: int) -> (H, W, 3)
    uint8 ndarray`` for a BITMAPINFOHEADER biCompression fourcc
    (e.g. 'MJPG', 'H264'); case-sensitive per the AVI spec."""
    _video_decoders[fourcc] = fn


def register_audio_decoder(fmt: str, fn: Callable) -> None:
    """``fn(data: bytes) -> (n,) float ndarray`` of mono samples."""
    _audio_decoders[fmt.lower()] = fn


def _load_plugins() -> None:
    """Import plugin modules named in $DWH_SPARK_CODEC_PLUGINS once per
    process; their top-level register_* calls populate the registry."""
    global _plugins_loaded
    if _plugins_loaded:
        return
    with _lock:
        if _plugins_loaded:
            return
        for mod in filter(None, os.environ.get(PLUGIN_ENV, "").split(",")):
            importlib.import_module(mod.strip())
        _plugins_loaded = True


def get_image_decoder(fmt: str) -> Callable | None:
    _load_plugins()
    return _image_decoders.get(fmt.lower())


def get_video_decoder(fourcc: str) -> Callable | None:
    _load_plugins()
    return _video_decoders.get(fourcc)


def get_audio_decoder(fmt: str) -> Callable | None:
    _load_plugins()
    return _audio_decoders.get(fmt.lower())


def _reset_for_tests() -> None:
    """Clear registrations and the plugin-load latch (test isolation)."""
    global _plugins_loaded
    _image_decoders.clear()
    _video_decoders.clear()
    _audio_decoders.clear()
    _plugins_loaded = False
