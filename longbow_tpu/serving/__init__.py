"""Serving edge: Arrow Flight protocol, wire-compatible with the
reference (reference: internal/store/servers.go — DataServer :3000,
MetaServer :3001; longbowclientsdk for the client conventions).
"""
