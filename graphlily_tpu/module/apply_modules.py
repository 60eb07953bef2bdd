"""Apply modules: eWiseAdd, dense assign, sparse assign (+/- new frontier).

Counterparts of graphlily/module/add_scalar_vector_dense_module.h,
assign_vector_dense_module.h, assign_vector_sparse_module.h.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import MaskType
from ..ops.reference import (ewise_add_scalar, assign_vector_dense,
                             assign_vector_sparse_no_new_frontier,
                             assign_vector_sparse_new_frontier)
from ..ops.vector import SparseVector
from .base import BaseModule, DeviceBuffer


class eWiseAddModule(BaseModule):
    """out[i] = in[i] + val. Reference: add_scalar_vector_dense_module.h.
    With val=0 it is the on-device vector copy (app/bfs.h:122)."""

    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.in_buf = DeviceBuffer()
        self.out_buf = DeviceBuffer()

    def bind_in_buf(self, buf: DeviceBuffer) -> None:
        self.in_buf = buf

    def bind_out_buf(self, buf: DeviceBuffer) -> None:
        self.out_buf = buf

    def send_in_host_to_device(self, v) -> None:
        self.in_buf.value = jnp.asarray(np.asarray(v, self.config.dtype))

    def send_out_device_to_host(self) -> np.ndarray:
        return np.asarray(self.out_buf.value)

    def run(self, length: int | None = None, val: float = 0.0) -> None:
        x = self.in_buf.value
        y = ewise_add_scalar(x, val, length)
        if self.config.simulate_ufixed:
            # the reference kernel adds in val_t (saturating ufixed,
            # add_scalar_vector_dense_module.h:150-189)
            from ..semiring import ufixed_quantize
            y = ufixed_quantize(y)
        self.out_buf.value = y

    @staticmethod
    def compute_reference_results(in_vec, length: int, val: float) -> np.ndarray:
        """Reference: add_scalar_vector_dense_module.h:195-204."""
        return np.asarray(in_vec, np.float64)[:length] + val


class AssignVectorDenseModule(BaseModule):
    """if mask[i] (==0 / !=0) then inout[i] = val.
    Reference: assign_vector_dense_module.h."""

    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.mask_buf = DeviceBuffer()
        self.inout_buf = DeviceBuffer()

    def bind_mask_buf(self, buf: DeviceBuffer) -> None:
        self.mask_buf = buf

    def bind_inout_buf(self, buf: DeviceBuffer) -> None:
        self.inout_buf = buf

    def send_mask_host_to_device(self, v) -> None:
        self.mask_buf.value = jnp.asarray(np.asarray(v, self.config.dtype))

    def send_inout_host_to_device(self, v) -> None:
        self.inout_buf.value = jnp.asarray(np.asarray(v, self.config.dtype))

    def send_inout_device_to_host(self) -> np.ndarray:
        return np.asarray(self.inout_buf.value)

    def run(self, length: int | None = None, val: float = 0.0) -> None:
        assert self.mask_type_ != MaskType.NO_MASK, \
            "mask type required (reference exits, assign_vector_dense_module.h:88-95)"
        self.inout_buf.value = assign_vector_dense(
            self.inout_buf.value, self.mask_buf.value, val, self.mask_type_)

    def compute_reference_results(self, mask, inout, length: int, val: float) -> None:
        """In-place numpy oracle, reference signature (mask, inout, len, val)."""
        m = np.asarray(mask)[:length]
        if self.mask_type_ == MaskType.WRITE_TO_ZERO:
            inout[:length][m == 0] = val
        else:
            inout[:length][m != 0] = val


class AssignVectorSparseModule(BaseModule):
    """Sparse assign; `generate_new_frontier` selects the SSSP relaxation
    variant. Reference: assign_vector_sparse_module.h:96-124, 279-303."""

    def __init__(self, generate_new_frontier: bool,
                 config: EngineConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.generate_new_frontier = generate_new_frontier
        self.mask_buf = DeviceBuffer()          # SparseVector
        self.inout_buf = DeviceBuffer()         # dense
        self.new_frontier_buf = DeviceBuffer()  # SparseVector (frontier mode)

    def bind_mask_buf(self, buf: DeviceBuffer) -> None:
        self.mask_buf = buf

    def bind_inout_buf(self, buf: DeviceBuffer) -> None:
        self.inout_buf = buf

    def bind_new_frontier_buf(self, buf: DeviceBuffer) -> None:
        assert self.generate_new_frontier
        self.new_frontier_buf = buf

    def send_mask_host_to_device(self, sv: SparseVector) -> None:
        self.mask_buf.value = sv

    def send_inout_host_to_device(self, v) -> None:
        self.inout_buf.value = jnp.asarray(np.asarray(v, self.config.dtype))

    def send_inout_device_to_host(self) -> np.ndarray:
        return np.asarray(self.inout_buf.value)

    def run(self, val: float | None = None) -> None:
        if self.generate_new_frontier:
            assert val is None, \
                "frontier mode takes no val (assign_vector_sparse_module.h:292-303)"
            new_inout, nf = assign_vector_sparse_new_frontier(
                self.inout_buf.value, self.mask_buf.value)
            self.inout_buf.value = new_inout
            self.new_frontier_buf.value = nf
        else:
            assert val is not None, \
                "val required (assign_vector_sparse_module.h:279-289)"
            self.inout_buf.value = assign_vector_sparse_no_new_frontier(
                self.inout_buf.value, self.mask_buf.value, val)

    # ---- oracles (reference: assign_vector_sparse_module.h:306-335) ------
    @staticmethod
    def compute_reference_results_no_new_frontier(mask_idx, inout, val) -> None:
        inout[np.asarray(mask_idx, np.int64)] = val

    @staticmethod
    def compute_reference_results_new_frontier(mask_idx, mask_val, inout):
        """Returns new-frontier (idx, val) lists; modifies inout in place."""
        nf_idx, nf_val = [], []
        for i, v in zip(mask_idx, mask_val):
            if inout[i] > v:
                inout[i] = v
                nf_idx.append(i)
                nf_val.append(v)
        return np.asarray(nf_idx), np.asarray(nf_val)
