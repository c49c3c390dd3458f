"""ROM-driven device playback: command sessions and autoplay catalog sweeps.

Combines the host VM control tracer (models/pipeline.ControlTracer) with the
device pipeline to play full ROM track programs on the TPU — the framework's
equivalent of DCSExplorer's interactive playback and --autoplay sweep
(reference: DCSExplorer/DCSExplorer.cpp:1271-1336).
"""

import numpy as np

import jax

from ..refdec import decoder as rd
from ..rom import tracks as rtracks
from . import pipeline as pl


def _chip_stream_ref(rom_set, linear):
    p = rom_set.make_pointer(linear)
    mem = p.mem.mem if isinstance(p.mem, rd.PaddedView) else p.mem
    return mem, p.pos


def build_rom_bank(rom_set):
    """Prescan + device-decode every stream referenced by the ROM's tracks."""
    bank = pl.StreamBank(rom_set.os_version)
    for linear in rtracks.list_streams(rom_set, rom_set.os_version):
        mem, pos = _chip_stream_ref(rom_set, linear)
        bank.add(mem, pos)
    bank.decode_all()
    return bank


def play_session(rom_set, events, n_frames, bank=None, default_volume=0x67):
    """Run a command-driven session on device.

    events: {frame_index: callable(decoder)} — e.g. write data-port bytes.
    Returns int16 PCM [n_frames * 240] (running-state frames only; boot is
    host-side and prepends silence/bong via the scalar decoder if needed).
    """
    if bank is None:
        bank = build_rom_bank(rom_set)
    tracer = pl.ControlTracer()
    tracer.default_volume = default_volume
    tracer.load_rom_set(rom_set)
    tracer.soft_boot()
    tracer.trace_frames(n_frames, events=events)

    rows, mix, vol = pl.assemble_controls(tracer, bank)
    pcm, _ = bank.jitted()(rows, mix, vol)
    pcm = np.asarray(pcm).reshape(-1)
    return (((pcm & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int16), tracer


def autoplay(rom_set, tracks=None, pad_frames=4, default_volume=0x67,
             max_frames_per_track=4000, return_tracer=False):
    """Autoplay sweep: play every type-1 track once (one iteration of its
    outermost loop), sequentially, on device.

    Returns (pcm int16 array, schedule) where schedule lists
    (track_no, start_frame, n_frames)."""
    os_v = rom_set.os_version
    if tracks is None:
        tracks = range(rom_set.n_tracks)
    plan = []
    for t in tracks:
        ti = rtracks.get_track_info(rom_set, os_v, t)
        if ti is not None and ti.type == 1 and ti.time > 0:
            plan.append((t, min(ti.time + pad_frames, max_frames_per_track)))

    bank = build_rom_bank(rom_set)
    events = {}
    schedule = []
    frame = 0
    for (t, dur) in plan:
        def make_event(track):
            def ev(dec):
                dec.clear_tracks()
                dec.write_data_port((track >> 8) & 0xFF)
                dec.write_data_port(track & 0xFF)
            return ev
        events[frame] = make_event(t)
        schedule.append((t, frame, dur))
        frame += dur
    total = frame + pad_frames

    pcm, tracer = play_session(rom_set, events, total, bank=bank,
                               default_volume=default_volume)
    if return_tracer:
        return pcm, schedule, tracer
    return pcm, schedule
