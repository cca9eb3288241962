"""Pipeline assembly: the jitted per-step signal chain and the host-side
receiver orchestrator (the normal_rx_routine analog, menu.c:576)."""

from .batch import BatchRunner
from .chain import RxOutputs, RxState, RxTables, make_rx_step
from .receiver import MultiReceiver, Receiver, Transport

__all__ = ["Receiver", "Transport", "BatchRunner", "RxState", "RxTables",
           "RxOutputs", "make_rx_step"]
