"""Query layer: ticket parsing and predicate filtering.

Wire-compatible with the reference's ticket JSON schema
(reference: query/requests.go:4-21, zero_alloc_parser.go:13-20).
"""
from longbow_tpu.query.parser import (  # noqa: F401
    Filter,
    TicketQuery,
    VectorSearchRequest,
    parse_ticket,
)
