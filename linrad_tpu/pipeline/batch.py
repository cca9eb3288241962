"""Batch (multi-step) runner: a whole recording segment per dispatch.

The streaming Receiver dispatches one jitted step per block — fine for
live audio, but for file-rate processing ("throughput mode",
SURVEY.md §7 hard part 4) host dispatch overhead caps throughput.  This
runner rolls K pipeline steps into one ``lax.scan`` so the device
processes K * samples_per_step samples per dispatch with zero host
round-trips in between.  State chains through the scan exactly as it
does across streamed steps, so results are identical (tested)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import derive_geometry
from ..params import RxParams
from .chain import RxState, RxTables, make_rx_step


class BatchRunner:
    """Process K steps per device dispatch.

    outputs: which RxOutputs fields to collect across steps (big spectra
    fields cost memory when stacked K-deep; default collects the audio
    and baseband streams)."""

    def __init__(self, params: RxParams, k_steps: int = 16,
                 outputs: tuple = ("audio", "baseb"),
                 calibration: dict | None = None):
        self.params = params
        self.geo = derive_geometry(params)
        self.k = k_steps
        self.outputs = tuple(outputs)
        self.tables = RxTables.create(self.geo, params, calibration)
        self.state = RxState.create(
            self.geo, spur=params.spur_enable,
            pol=params.pol_adapt_enable,
            fir_len=(int(self.tables.mix2.fir.shape[0])
                     if self.tables.mix2.fir is not None else 0))
        pw = 2
        if self.geo.second_fft_enable:
            from ..ops.blanker import BlankerTables
            _, pw = BlankerTables.create(self.geo)
        step = make_rx_step(self.geo, params, blanker_pulsewidth=pw)
        fields = self.outputs

        def run_k(tables, state, blocks, tune_bin):
            def body(s, blk):
                s, out = step(tables, s, blk, tune_bin)
                return s, tuple(getattr(out, f) for f in fields)

            state, outs = jax.lax.scan(body, state, blocks)
            return state, outs

        self._run_k = jax.jit(run_k, donate_argnums=(1,))
        self._tune_bin = jnp.zeros((), jnp.int32)

    def tune(self, freq_hz: float) -> None:
        n = self.geo.fftx_size
        fs = self.geo.timf1_sampling_speed
        self._tune_bin = jnp.asarray(
            int(round(freq_hz / fs * n)) % n, jnp.int32)

    @property
    def samples_per_call(self) -> int:
        return self.k * self.geo.samples_per_step

    def process(self, iq: np.ndarray) -> dict[str, np.ndarray]:
        """Process a recording; returns concatenated output streams.
        Trailing samples short of a full K-step call are dropped."""
        if iq.ndim == 1:
            iq = iq[:, None]
        s = self.geo.samples_per_step
        per = self.samples_per_call
        collected: dict[str, list] = {f: [] for f in self.outputs}
        for i in range(iq.shape[0] // per):
            from ..utils.xfer import device_complex
            seg = device_complex(iq[i * per:(i + 1) * per])
            blocks = seg.reshape(self.k, s, self.geo.channels)
            self.state, outs = self._run_k(self.tables, self.state,
                                           blocks, self._tune_bin)
            for f, v in zip(self.outputs, outs):
                a = np.asarray(v)               # (K, S_f, C)
                collected[f].append(a.reshape(-1, a.shape[-1]))
        return {f: (np.concatenate(v) if v else np.zeros((0, 1)))
                for f, v in collected.items()}
