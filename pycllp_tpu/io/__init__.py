"""Problem IO: MPS reader/writer, fixture generators (upstream: ``iolp.c``)."""
