# The reference's test_support/demo_config.rb, ported line-for-line to the
# traject-spark config DSL (exec'd by traject_spark.cli with to_field /
# each_record / settings / macros in scope). The two Ruby-block custom
# rules translate to Column-expression transforms; the local-holdings
# (991/937) discipline block is site-specific and omitted.
from pyspark.sql import functions as F

# provide (first-set-wins, demo_config.rb:23): the command line's -u/-s
# solr.url must override this file's default, not the other way around
provide("solr.url", "http://solr.somewhere.edu:8983/solr/corename")

# 001 with "bib_" prefix (demo_config.rb:27-29's accumulator block)
to_field(
    "id",
    extract_marc("001", first=True),
    T.transform(lambda v: F.concat(F.lit("bib_"), v)),
)

to_field("source", literal("traject_test_last"))

to_field(
    "marc_display",
    serialized_marc("binary", binary_escape=False, allow_oversized=True),
)

to_field("text", extract_all_marc_values())

to_field("text_extra_boost_t", extract_marc("505art"))

to_field("publisher_t", extract_marc("260abef:261abef:262ab:264ab"))

to_field("language_facet", marc_languages())

to_field("format", marc_formats())

to_field("isbn_t", extract_marc("020a:773z:776z:534z:556z"))
to_field("lccn", extract_marc("010a"))

to_field(
    "material_type_display",
    extract_marc("300a", separator=None, trim_punctuation=True),
)

to_field("title_t", extract_marc("245ak"))
to_field("title1_t", extract_marc("245abk"))
to_field(
    "title2_t",
    extract_marc(
        "245nps:130:240abcdefgklmnopqrs:210ab:222ab:242abcehnp:"
        "243abcdefgklmnopqrs:246abcdefgnp:247abcdefgnp"
    ),
)
to_field(
    "title3_t",
    extract_marc(
        "700gklmnoprst:710fgklmnopqrst:711fgklnpst:730abdefgklmnopqrst:"
        "740anp:505t:780abcrst:785abcrst:773abrst"
    ),
)


# demo_config.rb:63-71: 505$t values, but only from 505 fields that also
# carry $r — per-record Ruby loop re-expressed as one Column expression
def _505_with_r(ctx):
    fields = F.filter(
        ctx.marc["datafields"],
        lambda f: (f["tag"] == "505")
        & F.exists(f["subfields"], lambda sf: sf["code"] == "r"),
    )
    vals = F.flatten(
        F.transform(
            fields,
            lambda f: F.transform(
                F.filter(f["subfields"], lambda sf: sf["code"] == "t"),
                lambda sf: sf["value"],
            ),
        )
    )
    ctx.add_output("title3_t", vals)


each_record(_505_with_r)

to_field(
    "title_display", extract_marc("245abk", trim_punctuation=True, first=True)
)
to_field("title_sort", marc_sortable_title())

to_field(
    "title_series_t",
    extract_marc(
        "440a:490a:800abcdt:400abcd:810abcdt:410abcd:811acdeft:411acdef:"
        "830adfgklmnoprst:760ast:762ast"
    ),
)
to_field("series_facet", marc_series_facet())

to_field("author_unstem", extract_marc("100abcdgqu:110abcdgnu:111acdegjnqu"))

to_field(
    "author2_unstem",
    extract_marc(
        "700abcdegqu:710abcdegnu:711acdegjnqu:720a:505r:245c:191abcdegqu"
    ),
)
to_field("author_display", extract_marc("100abcdq:110:111"))
to_field("author_sort", marc_sortable_author())

to_field(
    "author_facet",
    extract_marc(
        "100abcdq:110abcdgnu:111acdenqu:700abcdq:710abcdgnu:711acdenqu",
        trim_punctuation=True,
    ),
)

to_field(
    "subject_t",
    extract_marc(
        "600:610:611:630:650:651avxyz:653aa:654abcvyz:655abcvxyz:"
        "690abcdxyz:691abxyz:692abxyz:693abxyz:656akvxyz:657avxyz:"
        "652axyz:658abcd"
    ),
)

# demo_config.rb:86-95: upcase a downcased first letter (MeSH quirk)
to_field(
    "subject_topic_facet",
    extract_marc(
        "600abcdtq:610abt:610x:611abt:611x:630aa:630x:648a:648x:650aa:"
        "650x:651a:651x:691a:691x:653aa:654ab:656aa:690a:690x",
        trim_punctuation=True,
    ),
    # gsub(/\A[a-z]/) — ASCII-only: 'études' stays lowercase and
    # multi-char uppercasings (ß->SS) never fire (demo_config.rb:88-93)
    T.transform(
        lambda v: F.when(
            v.substr(1, 1).rlike("^[a-z]$"),
            F.concat(
                F.upper(v.substr(1, 1)), v.substr(F.lit(2), F.length(v))
            ),
        ).otherwise(v)
    ),
)

to_field("subject_geo_facet", marc_geo_facet())
to_field("subject_era_facet", marc_era_facet())

to_field("published_display", extract_marc("260a", trim_punctuation=True))

to_field("pub_date", marc_publication_date())

to_field("instrumentation_facet", marc_instrumentation_humanized())
to_field("instrumentation_code_unstem", marc_instrument_codes_normalized())

to_field("issn", extract_marc("022a:022l:022y:773x:774x:776x", separator=None))
to_field(
    "issn_related",
    extract_marc(
        "490x:440x:800x:400x:410x:411x:810x:811x:830x:700x:710x:711x:730x:"
        "780x:785x:777x:543x:760x:762x:765x:767x:770x:772x:775x:786x:787x",
        separator=None,
    ),
)

to_field("oclcnum_t", oclcnum())

to_field("other_number_unstem", extract_marc("024a:028a"))
