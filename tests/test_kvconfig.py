from matryoshka_mm_tpu.kvconfig import (
    create_string_from_kv,
    parse_kv_from_string,
    parse_list,
    per_scale_specs,
    tokscales_from_spec,
)


def test_parse_basic_scale_spec():
    kvs = parse_kv_from_string("ver=v0_numtoks=[1,9,36,144,576]")
    assert kvs["ver"] == "v0"
    assert kvs["numtoks"] == "[1,9,36,144,576]"
    assert parse_list(kvs["numtoks"]) == [1, 9, 36, 144, 576]


def test_parse_numeric_coercion():
    kvs = parse_kv_from_string("ver=v0_numtoks=576")
    assert kvs["numtoks"] == 576  # int so tokscale_list.index() works
    kvs = parse_kv_from_string("t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01")
    assert kvs == {"t": "dense", "ft": "cls", "obj": "weightedlm",
                   "loadb": "switch", "alpha": 0.01}


def test_parse_gateprobargmax():
    kvs = parse_kv_from_string("ver=v0_numtoks=gateprobargmax")
    assert kvs["numtoks"] == "gateprobargmax"


def test_parse_v2_combine():
    kvs = parse_kv_from_string("ver=v2_numtoks=[1,144]_betas=[1,0.5]_gamma=0.1")
    assert kvs["ver"] == "v2"
    assert parse_list(kvs["betas"]) == [1, 0.5]
    assert kvs["gamma"] == 0.1


def test_roundtrip():
    s = "ver=v0_numtoks=[1,9,36,144,576]"
    assert create_string_from_kv(parse_kv_from_string(s)) == s


def test_per_scale_specs():
    assert per_scale_specs("ver=v0_numtoks=[1,9]") == [
        "ver=v0_numtoks=1",
        "ver=v0_numtoks=9",
    ]


def test_tokscales_from_spec():
    assert tokscales_from_spec("ver=v0_numtoks=[1,9,36,144,576]") == [1, 9, 36, 144, 576]


def test_multi_feature_types():
    kvs = parse_kv_from_string("t=dense_ft=cls,textcls_obj=weightedlm")
    assert str(kvs["ft"]).split(",") == ["cls", "textcls"]
