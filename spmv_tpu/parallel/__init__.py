from spmv_tpu.parallel.partition import RowPartition, partition_rows
from spmv_tpu.parallel.dist_spmv import DistributedSpMV, distribute_csr

__all__ = [
    "RowPartition",
    "partition_rows",
    "DistributedSpMV",
    "distribute_csr",
]
