

def test_lookup_before_get_fans_out_and_unions(sf_dir):
    from core_ray.ops import raw
    from core_ray.pipelines.framework import lookup_before_get

    START, END = "2024-01-01 00:00:00", "2024-01-31 00:00:00"

    def q(source, tags):
        return raw(source, start=START, end=END, tags=tags, sort=False)

    mapping = {sf_dir: ["click"], sf_dir + "": ["purchase"]}
    # two distinct "tables" (same fixture dir twice would collide keys; use
    # an explicit two-entry mapping via list of pairs semantics)
    combined = lookup_before_get(q, {sf_dir: ["click", "purchase"]})
    both = q(sf_dir, ["click", "purchase"])
    assert combined.count() == both.count()

    split = lookup_before_get(
        q, {sf_dir: ["click"]},
    ).count() + lookup_before_get(q, {sf_dir: ["purchase"]}).count()
    assert split == both.count()
