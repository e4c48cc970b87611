from ldpc_tpu.helpers.scipy_helpers import convert_to_binary_sparse

__all__ = ["convert_to_binary_sparse"]
