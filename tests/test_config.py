"""Config preset tests: reference operating point + serialization."""

import pytest

from prefhetch_tpu.utils.config import (
    IndexParams,
    PipelineConfig,
    ProtocolParams,
    REFERENCE_PRESET,
    SIFT1M_PRESET,
)


def test_reference_operating_point():
    """Matches include/common/client_server_utils.h:10-20 exactly."""
    c = REFERENCE_PRESET
    assert c.index.d == 128
    assert c.protocol.nprobe == 20
    assert c.protocol.coarse_probe == 200
    assert c.protocol.k == 100
    assert c.nbase == 10000
    assert c.protocol.nquery == 5
    assert c.index.nlist == 256
    assert c.index.pq_m == 32
    assert c.index.pq_nbits == 8


def test_derived_pq_geometry():
    p = IndexParams(d=128, pq_m=32, pq_nbits=8)
    assert p.dsub == 4
    assert p.ksub == 256
    assert p.uses_pq


def test_ivf_flat_mode():
    p = IndexParams(pq_m=0)
    assert not p.uses_pq
    assert "FLAT" in p.artifact_name()


def test_artifact_name_encodes_params():
    a = IndexParams(nlist=256).artifact_name()
    b = IndexParams(nlist=512).artifact_name()
    assert a != b and "IVF256" in a


def test_protocol_guard():
    with pytest.raises(ValueError):
        ProtocolParams(k=300, coarse_probe=200).validate()


def test_json_roundtrip():
    c = SIFT1M_PRESET
    c2 = PipelineConfig.from_json(c.to_json())
    assert c2 == c
