# -*- coding: utf-8 -*-
"""Video/audio reference → 100 Hz speech signal (the streaming decode path).

Host/device split: ffmpeg (an external binary) decodes the container to raw
s16le mono PCM on a pipe, exactly as in the reference
(ffsubsync/speech_transformers.py:525-757); the host stages ~100 s chunks
(10000 windows per buffer) and each chunk is processed by a *device* VAD
kernel (ops/vad.py) instead of a per-10 ms host loop. Decode runs concurrently
with device compute via the subprocess pipe.

Additional native path: WAV/PCM references are decoded in-process
(media/wav.py), skipping the subprocess entirely — s16le blocks go straight
from the memory map into the device staging buffer.

Feature parity: embedded-subtitle fast path with fallback to audio
(speech_transformers.py:609-619), --start-seconds / --max-duration-seconds
ffmpeg arg construction (:525-562), remote-URL audio pre-extraction to a
temporary .mka with ``-acodec copy`` (:564-607), progress reporting in all
four modes, and the "sum of speech segments" log line (:754).
"""
import logging
import os
import subprocess
import tempfile
from datetime import timedelta
from typing import Any, Callable, List, Optional

import numpy as np

from ffsubsync_tpu.constants import is_remote_url
from ffsubsync_tpu.media.ffmpeg import ffmpeg_bin_path, probe_duration, subprocess_args
from ffsubsync_tpu.media.wav import WavReader, is_wav_file
from ffsubsync_tpu.ops.vad import make_detector
from ffsubsync_tpu.utils.progress import ProgressInfo, ProgressReporter

logger = logging.getLogger(__name__)

WINDOWS_PER_BUFFER = 10000  # ~100 s of audio per staged chunk


def _join_pcm_parts(parts):
    """One contiguous buffer from accumulated PCM chunks. Single-part lists
    pass through untouched (the zero-copy WAV case); mixed types never occur
    (a source yields either bytes or int16 arrays for its whole run)."""
    if len(parts) == 1:
        return parts[0]
    if isinstance(parts[0], np.ndarray):
        return np.concatenate(parts)
    return b"".join(parts)


class VideoSpeechSource:
    """Speech extraction from a video/audio reference."""

    def __init__(
        self,
        vad: str,
        sample_rate: int,
        frame_rate: int,
        non_speech_label: float,
        start_seconds: int = 0,
        ffmpeg_path: Optional[str] = None,
        ref_stream: Optional[str] = None,
        vlc_mode: bool = False,
        gui_mode: bool = False,
        max_duration_seconds: Optional[float] = None,
        extract_audio_first: bool = False,
        progress_handler: Optional[Callable[[ProgressInfo], None]] = None,
    ) -> None:
        self.vad = vad
        self.sample_rate = sample_rate
        self.frame_rate = frame_rate
        self._non_speech_label = non_speech_label
        self.start_seconds = start_seconds
        self.ffmpeg_path = ffmpeg_path
        self.ref_stream = ref_stream
        self.vlc_mode = vlc_mode
        self.gui_mode = gui_mode
        self.max_duration_seconds = max_duration_seconds
        self.extract_audio_first = extract_audio_first
        self.progress_handler = progress_handler
        self.video_speech_results_: Optional[Any] = None  # np.ndarray | RasterSpec

    # -- embedded-subtitle fast path ------------------------------------

    def try_fit_using_embedded_subs(self, fname: str) -> None:
        from ffsubsync_tpu.media.embedded import fit_embedded_subs

        self.video_speech_results_ = fit_embedded_subs(
            fname,
            start_seconds=self.start_seconds,
            ref_stream=self.ref_stream,
            gui_mode=self.gui_mode,
            ffmpeg_path=self.ffmpeg_path,
        )

    # -- ffmpeg decode ----------------------------------------------------

    def _decode_rate(self) -> int:
        """The sample rate ffmpeg is asked to deliver.

        ``--frame-rate`` names the requested decode rate (reference
        semantics), but VAD features are computed at the derived *analysis*
        rate (ops/features.analysis_rate) — so the decoder is asked for that
        rate directly: ffmpeg's resampler is higher quality than any host
        decimator, the decode is cheaper, and 4× fewer PCM bytes cross the
        pipe and the host→device link.
        """
        from ffsubsync_tpu.ops.features import analysis_rate

        return analysis_rate(self.frame_rate, self.sample_rate)

    def _build_ffmpeg_args(self, fname: str) -> List[str]:
        ffmpeg_args = [
            ffmpeg_bin_path("ffmpeg", self.gui_mode, ffmpeg_resources_path=self.ffmpeg_path)
        ]
        if self.start_seconds > 0:
            ffmpeg_args.extend(["-ss", str(timedelta(seconds=self.start_seconds))])
        if self.max_duration_seconds is not None:
            # input-side -t: stop reading (and, for remote URLs, downloading)
            # after this many seconds past the seek point
            ffmpeg_args.extend(["-t", str(timedelta(seconds=self.max_duration_seconds))])
        ffmpeg_args.extend(["-loglevel", "fatal", "-nostdin", "-i", fname])
        if self.ref_stream is not None and self.ref_stream.startswith("0:a:"):
            ffmpeg_args.extend(["-map", self.ref_stream])
        ffmpeg_args.extend(
            [
                "-f",
                "s16le",
                "-ac",
                "1",
                "-acodec",
                "pcm_s16le",
                "-af",
                "aresample=async=1",
                "-ar",
                str(self._decode_rate()),
                "-",
            ]
        )
        return ffmpeg_args

    def _extract_audio_to_temp(self, url: str) -> Optional[str]:
        """Copy the reference's audio to a local temp .mka (no re-encode).

        Returns the temp path, or None on failure (caller streams the URL
        directly instead).
        """
        fd, temp_path = tempfile.mkstemp(suffix=".mka")
        os.close(fd)
        ffmpeg_args = [
            ffmpeg_bin_path("ffmpeg", self.gui_mode, ffmpeg_resources_path=self.ffmpeg_path),
            "-loglevel",
            "fatal",
            "-nostdin",
            "-y",
            "-i",
            url,
            "-vn",
            "-acodec",
            "copy",
        ]
        if self.max_duration_seconds is not None:
            # extract from t=0 up to start+max so the main pass can still seek
            # --start-seconds accurately within the local file
            limit = self.start_seconds + self.max_duration_seconds
            ffmpeg_args.extend(["-t", str(timedelta(seconds=limit))])
        ffmpeg_args.append(temp_path)
        logger.info("extracting audio from remote reference to %s...", temp_path)
        retcode = subprocess.call(ffmpeg_args, **subprocess_args(include_stdout=False))
        if retcode != 0 or not os.path.getsize(temp_path):
            logger.warning(
                "audio extraction failed (ffmpeg returned %d); "
                "falling back to streaming the reference directly",
                retcode,
            )
            try:
                os.remove(temp_path)
            except OSError:
                pass
            return None
        return temp_path

    # -- main entry ------------------------------------------------------

    def fit(self, fname: str, *_: Any) -> "VideoSpeechSource":
        if "subs" in self.vad and (
            self.ref_stream is None or self.ref_stream.startswith("0:s:")
        ):
            try:
                logger.info("Checking video for subtitles stream...")
                self.try_fit_using_embedded_subs(fname)
                logger.info("...success!")
                return self
            except Exception as e:
                logger.info(e)
        temp_audio = None
        if self.extract_audio_first and is_remote_url(fname):
            temp_audio = self._extract_audio_to_temp(fname)
            if temp_audio is not None:
                fname = temp_audio
        try:
            self._fit_using_audio(fname)
        finally:
            if temp_audio is not None and os.path.exists(temp_audio):
                try:
                    os.remove(temp_audio)
                except OSError:
                    logger.warning("failed to remove temp audio file %s", temp_audio)
        return self

    def _use_native_wav(self, fname: str) -> bool:
        return (
            not is_remote_url(fname)
            and os.path.exists(fname)
            and is_wav_file(fname)
            and os.environ.get("FFS_TPU_DISABLE_NATIVE_WAV") != "1"
        )

    def _pcm_rate(self, fname: str) -> int:
        """Rate of the PCM this source stages for detection.

        ffmpeg decodes straight to the analysis rate. The native WAV reader
        stays at the *file's* rate whenever the VAD stack can analyze it
        as-is (integer windows at ``sample_rate``; trained neural weights
        for the derived analysis rate when the mode needs them): the hot
        mono-s16le case then streams zero-copy memmap slices with no
        resampling at all, and the staging pass half-band decimates on the
        one pass it already makes. Only rate-incompatible files (44.1 kHz
        family, etc.) take the reader's linear resampler up to
        ``frame_rate`` — never down (aliasing); proper decimation happens in
        the device staging path.
        """
        if self._use_native_wav(fname):
            file_rate = WavReader(fname).sample_rate
            if file_rate % self.sample_rate == 0 and self._can_analyze_rate(
                file_rate
            ):
                return file_rate
            return self.frame_rate
        return self._decode_rate()

    def _can_analyze_rate(self, file_rate: int) -> bool:
        from ffsubsync_tpu.ops.features import _MIN_ANALYSIS_RATE, analysis_rate

        rate = analysis_rate(file_rate, self.sample_rate)
        decimate_on = os.environ.get("FFS_TPU_ANALYSIS_DECIMATE", "1") != "0"
        if decimate_on and rate > 2 * _MIN_ANALYSIS_RATE:
            # decimation can't engage (44.1 kHz family): staying at the file
            # rate would ship ~4x the wire bytes and blow the lane-aligned
            # window budget — take the resample-to-frame_rate path instead.
            # With decimation disabled by request, full-rate analysis is the
            # point — keep the native path at the file's rate.
            return False
        if not ("silero" in self.vad or "fused" in self.vad):
            return True
        from ffsubsync_tpu.models.neural_vad import has_trained_weights

        return has_trained_weights(rate)

    def _iter_pcm_chunks(self, fname: str, bytes_per_buffer: int,
                         pcm_rate: int):
        """Yield raw PCM chunks: ffmpeg pipe normally, in-process for WAV.

        ffmpeg chunks are ``bytes``; native-WAV chunks are int16 ndarrays
        (zero-copy memmap slices on the hot path) — every consumer of PCM
        chunks accepts both, and skipping the bytes round trip saves two
        full passes over a movie's PCM on a bandwidth-limited host.
        ``pcm_rate`` is the caller's (single) ``_pcm_rate`` probe — passed in
        so the WAV header is parsed once per fit, not once per consumer."""
        if self._use_native_wav(fname):
            logger.info("decoding WAV natively (no ffmpeg subprocess)")
            reader = WavReader(fname)
            for chunk in reader.iter_chunks(
                target_rate=pcm_rate,
                chunk_seconds=float(WINDOWS_PER_BUFFER) / self.sample_rate,
                start_seconds=self.start_seconds,
                max_duration_seconds=self.max_duration_seconds,
            ):
                yield chunk
            return
        process = subprocess.Popen(
            self._build_ffmpeg_args(fname), **subprocess_args(include_stdout=True)
        )
        try:
            while True:
                in_bytes = process.stdout.read(bytes_per_buffer)
                if not in_bytes:
                    break
                yield in_bytes
        finally:
            process.wait()

    def _probe_total_duration(self, fname: str) -> Optional[float]:
        try:
            if not is_remote_url(fname) and is_wav_file(fname):
                total = WavReader(fname).duration_seconds - self.start_seconds
            else:
                total = (
                    probe_duration(
                        fname, self.gui_mode, ffmpeg_resources_path=self.ffmpeg_path
                    )
                    - self.start_seconds
                )
            return total
        except Exception as e:
            logger.warning(e)
            return None

    def _use_buffered_vad(
        self, total_duration: Optional[float], pcm_rate: Optional[int] = None
    ) -> bool:
        """Buffered mode holds the whole PCM and runs VAD in one device pass
        (a handful of launches for a movie); streaming mode keeps the
        reference's constant-memory chunk loop. Decode dominates wall-clock
        either way, so buffered is the default unless the buffer would be
        huge or the user forces streaming."""
        if os.environ.get("FFS_TPU_STREAMING_VAD") == "1":
            return False
        max_bytes = int(
            os.environ.get("FFS_TPU_MAX_BUFFER_BYTES", 4 * 1024**3)
        )
        if total_duration is not None:
            estimated = int(total_duration) * 2 * (pcm_rate or self.frame_rate)
            if estimated > max_bytes:
                logger.info(
                    "reference too long to buffer (%d bytes est.); "
                    "streaming VAD chunk by chunk",
                    estimated,
                )
                return False
        return True

    def _fit_using_audio(self, fname: str) -> None:
        total_duration = self._probe_total_duration(fname)
        if self.max_duration_seconds is not None and total_duration is not None:
            total_duration = min(total_duration, self.max_duration_seconds)
        pcm_rate = self._pcm_rate(fname)
        detector = make_detector(
            self.vad, self.sample_rate, pcm_rate, self._non_speech_label
        )
        buffered = self._use_buffered_vad(total_duration, pcm_rate)
        sp_detector = None
        if buffered:
            from ffsubsync_tpu.parallel.vad_shard import maybe_sharded_detector

            # when active, the whole buffer runs as ONE sequence-parallel
            # launch at the end; the chunked state-carrying `detector` is
            # kept for the streaming spill fallback
            sp_detector = maybe_sharded_detector(
                self.vad, self.sample_rate, pcm_rate, self._non_speech_label
            )
        max_buffer_bytes = int(
            os.environ.get("FFS_TPU_MAX_BUFFER_BYTES", 4 * 1024**3)
        )
        bytes_per_frame = 2
        bytes_per_window = bytes_per_frame * pcm_rate // self.sample_rate
        # buffered mode pipelines the VAD: once a device-sized chunk has
        # accumulated it is dispatched asynchronously, so host staging, the
        # host→device wire, and device compute all overlap the ffmpeg decode
        # that dominates wall-clock; results are pulled once at the end
        dispatch_async = getattr(detector, "dispatch_async", None)
        gather = getattr(detector, "gather", None)
        pipeline_bytes = 0
        if sp_detector is not None:
            # the sequence-parallel launch needs the whole buffer; skip the
            # incremental chunk dispatch
            dispatch_async = gather = None
        if getattr(detector, "buffers_pcm", False) and total_duration is None:
            # this detector's async handles retain the raw PCM (auditok's
            # whole-signal tokenizer), so dispatching would make the
            # max-buffer spill below unreachable — exactly in the case the
            # cap guards (an unknown duration). Accumulate through the
            # normal buffered path instead, where the cap can fire.
            dispatch_async = gather = None
        if dispatch_async is not None and gather is not None:
            from ffsubsync_tpu.ops.vad import _pipeline_chunk_samples

            pipeline_bytes = (
                _pipeline_chunk_samples(pcm_rate, self.sample_rate)
                * bytes_per_frame
            )
        media_bstring: List[np.ndarray] = []
        pcm_parts: List[bytes] = []
        pending_handles: List[Any] = []
        buffered_bytes = 0
        with ProgressReporter(
            total_duration,
            progress_handler=self.progress_handler,
            vlc_mode=self.vlc_mode,
            gui_mode=self.gui_mode,
        ) as progress:
            for in_bytes in self._iter_pcm_chunks(
                fname, bytes_per_window * WINDOWS_PER_BUFFER, pcm_rate
            ):
                chunk_nbytes = (
                    in_bytes.nbytes
                    if isinstance(in_bytes, np.ndarray)
                    else len(in_bytes)
                )
                newstuff = chunk_nbytes / float(bytes_per_frame) / pcm_rate
                progress.update(newstuff)
                if buffered:
                    pcm_parts.append(in_bytes)
                    buffered_bytes += chunk_nbytes
                    if pipeline_bytes and buffered_bytes >= pipeline_bytes:
                        pending_handles.append(
                            dispatch_async(_join_pcm_parts(pcm_parts))
                        )
                        pcm_parts = []
                        buffered_bytes = 0
                    elif buffered_bytes > max_buffer_bytes:
                        # the duration probe lied or failed: drain the parts
                        # through the (state-carrying) detector one streaming
                        # chunk at a time — no whole-buffer join, so peak
                        # memory stays at the cap — then keep streaming
                        logger.info(
                            "buffered %d bytes, above the cap; "
                            "switching to streaming VAD",
                            buffered_bytes,
                        )
                        media_bstring.extend(detector(p) for p in pcm_parts)
                        pcm_parts = []
                        buffered = False
                else:
                    media_bstring.append(detector(in_bytes))
        if buffered and pending_handles:
            if pcm_parts:
                pending_handles.append(dispatch_async(_join_pcm_parts(pcm_parts)))
            media_bstring.append(gather(pending_handles))
        elif buffered and pcm_parts:
            whole_buffer_detector = sp_detector or detector
            media_bstring.append(
                whole_buffer_detector(_join_pcm_parts(pcm_parts))
            )
        if len(media_bstring) == 0:
            raise ValueError(
                "Unable to detect speech. "
                "Perhaps try specifying a different stream / track, or a different vad."
            )
        if len(media_bstring) == 1 and hasattr(media_bstring[0], "padded_values"):
            # the whole reference went through the async device pipeline:
            # keep the labels on the device — the aligner consumes them
            # there, so no host pull (and no re-push) ever happens
            self.video_speech_results_ = media_bstring[0]
            logger.info(
                "total of speech segments: %s",
                self.video_speech_results_.sum(),
            )
        else:
            self.video_speech_results_ = np.concatenate(
                [np.asarray(m, dtype=np.float64) for m in media_bstring]
            )
            logger.info(
                "total of speech segments: %s",
                np.sum(self.video_speech_results_),
            )

    # -- sync-core accessors ----------------------------------------------

    def transform(self, *_: Any) -> np.ndarray:
        assert self.video_speech_results_ is not None
        if isinstance(self.video_speech_results_, np.ndarray):
            return self.video_speech_results_
        return self.video_speech_results_.materialize()

    def signal_or_spec(self) -> Any:
        assert self.video_speech_results_ is not None
        return self.video_speech_results_

    @property
    def prefer_host_align(self) -> bool:
        """Host-score only when the embedded-subs fallback produced cue
        geometry (no audio pipeline — and so no device session — ever ran);
        audio-derived labels live on the device and align there."""
        from ffsubsync_tpu.subs.raster import RasterSpec

        return isinstance(self.video_speech_results_, RasterSpec)
