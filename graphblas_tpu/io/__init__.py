"""IO converters (reference: /root/reference/graphblas/io/).

from/to scipy.sparse, networkx, Matrix Market, pydata sparse, awkward
(gated on availability, like the reference's optional deps).
"""

from ._matrixmarket import mmread, mmwrite  # noqa: F401
from ._networkx import from_networkx, to_networkx  # noqa: F401
from ._scipy import from_scipy_sparse, to_scipy_sparse  # noqa: F401
from ._sparse import from_pydata_sparse, to_pydata_sparse  # noqa: F401
from ._awkward import from_awkward, to_awkward  # noqa: F401
