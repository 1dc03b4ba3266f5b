"""Golden-output tests: the reference's published expected results
(301-spark-basics/README.md:68-76) on its own micro-fixtures, plus the
weather/movielens lab pipelines on constructed fixture files.
"""

from __future__ import annotations

import pytest

from bigdatalab_spark.queries import lab
from bigdatalab_spark.sources.fixtures import (
    read_movies,
    read_ratings,
    read_stations,
    read_tags,
    read_tweets,
    read_weather,
)

CAPRA = "sopra la panca la capra campa\nsotto la panca la capra crepa\n"


@pytest.fixture()
def capra_lines(spark, tmp_path):
    p = tmp_path / "capra.txt"
    p.write_text(CAPRA)
    return spark.read.text(str(p))


def _isd_line(usaf, wban, year, month, day, raw_temp, quality="1"):
    """Build a fixed-width ISD line with the load-bearing offsets:
    usaf[4:10) wban[10:15) year[15:19) month[19:21) day[21:23)
    temp[87:92) quality[92]."""
    line = [" "] * 93
    def put(s, start):
        for i, ch in enumerate(s):
            line[start + i] = ch
    put(usaf.ljust(6), 4)
    put(wban.ljust(5), 10)
    put(year, 15)
    put(month, 19)
    put(day, 21)
    put(f"{raw_temp:+05d}", 87)
    put(quality, 92)
    return "".join(line)


def test_capra_word_count_golden(capra_lines):
    got = {r.word: r["count"] for r in lab.word_count(capra_lines).collect()}
    assert got["sopra"] == 1 and got["la"] == 4
    assert got == {
        "sopra": 1, "la": 4, "panca": 2, "capra": 2, "campa": 1,
        "sotto": 1, "crepa": 1,
    }


def test_capra_word_length_golden(capra_lines):
    got = {r.length: r["count"] for r in lab.word_length_count(capra_lines).collect()}
    assert got == {2: 4, 5: 8}


def test_capra_avg_length_by_initial_golden(capra_lines):
    got = {
        r.initial: r.avg_len
        for r in lab.avg_word_length_by_initial(capra_lines).collect()
    }
    assert got["s"] == 5.0 and got["l"] == 2.0
    assert got["p"] == 5.0 and got["c"] == 5.0


def test_capra_inverted_index_golden(capra_lines):
    got = {r.word: list(r.lines) for r in lab.inverted_index(capra_lines).collect()}
    assert got["sopra"] == [0] and got["la"] == [0, 1]
    assert got["panca"] == [0, 1] and got["crepa"] == [1]


@pytest.fixture()
def weather_files(spark, tmp_path):
    lines = [
        _isd_line("010010", "99999", "2020", "01", "01", 26),    # 2.6
        _isd_line("010010", "99999", "2020", "01", "02", -15),   # -1.5
        _isd_line("010010", "99999", "2020", "02", "01", 104),   # 10.4
        _isd_line("020020", "99999", "2020", "02", "02", 9999),  # missing
        _isd_line("020020", "99999", "2021", "02", "03", 52),    # 5.2
        _isd_line("030030", "11111", "2021", "03", "01", 200),   # 20.0 orphan
    ]
    wp = tmp_path / "weather.txt"
    wp.write_text("\n".join(lines) + "\n")
    sp = tmp_path / "stations.csv"
    sp.write_text(
        '"010010","99999","LONDON CITY","UK","","","51.5","0.1","10",'
        '"20120101","20209999"\n'
        '"020020","99999","MANCHESTER","UK","","","53.4","2.2","",'
        '"20120101","20209999"\n'
        '"040040","22222","PARIS","FR","","","48.8","2.3","35",'
        '"20120101","20209999"\n'
    )
    return str(wp), str(sp)


def test_weather_parse_and_sentinel(spark, weather_files):
    wpath, _ = weather_files
    w = read_weather(spark, wpath)
    rows = {(r.usaf, r.year, r.month, r.day): r for r in w.collect()}
    assert rows[("010010", "2020", "01", "01")].temperature == pytest.approx(2.6)
    assert rows[("010010", "2020", "01", "02")].temperature == pytest.approx(-1.5)
    missing = rows[("020020", "2020", "02", "02")]
    assert missing.temperature == pytest.approx(999.9)
    assert not missing.validTemperature


def test_station_parse_empty_defaults(spark, weather_files):
    _, spath = weather_files
    s = read_stations(spark, spath)
    rows = {r.usaf: r for r in s.collect()}
    assert rows["020020"].elevation == 0.0  # empty -> 0.0 (StationData)
    assert rows["010010"].elevation == 10.0
    assert rows["010010"].country == "UK"


def test_avg_temperature_per_month(spark, weather_files):
    wpath, _ = weather_files
    got = {
        r.month: r.avg_temp
        for r in lab.avg_temperature_per_month(read_weather(spark, wpath)).collect()
    }
    assert got["01"] == pytest.approx((2.6 - 1.5) / 2)
    assert got["02"] == pytest.approx((10.4 + 5.2) / 2)  # sentinel excluded
    assert got["03"] == pytest.approx(20.0)


def test_max_temperature_per_uk_city(spark, weather_files):
    wpath, spath = weather_files
    got = lab.max_temperature_per_uk_city(
        read_weather(spark, wpath), read_stations(spark, spath)
    ).collect()
    # PARIS (FR) excluded; orphan 030030 dropped by inner join;
    # sorted desc by max_temp
    assert [(r.name, r.max_temp) for r in got] == [
        ("LONDON CITY", 10.4),
        ("MANCHESTER", 5.2),
    ]


@pytest.fixture()
def movielens_files(tmp_path):
    mp = tmp_path / "movies.csv"
    mp.write_text(
        "movieId,title,genres\n"
        '1,Toy Story,Animation|Children\n'
        '2,"Heat, The",Action|Crime\n'
        "3,Jumanji,(no genres listed)\n"
        "badrow,,,\n"
    )
    rp = tmp_path / "ratings.csv"
    # 1577836800 = 2020-01-01; 1609459200 = 2021-01-01 (UTC)
    rp.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,1,4.0,1577836800\n"
        "2,1,5.0,1577836800\n"
        "1,2,3.0,1577836800\n"
        "2,2,2.5,1609459200\n"
        "3,3,4.5,1609459200\n"
    )
    tp = tmp_path / "tags.csv"
    tp.write_text(
        "userId,movieId,tag,timestamp\n"
        "1,1,classic,1577836800\n"
        "1,1,pixar,1577836800\n"
        "2,3,board game,1609459200\n"
    )
    return str(mp), str(rp), str(tp)


def test_movielens_parse_quoted_and_malformed(spark, movielens_files):
    mp, _, _ = movielens_files
    movies = read_movies(spark, mp)
    rows = {r.movieId: r for r in movies.collect()}
    assert rows[2].title == "Heat, The"  # quote-aware comma
    assert len(rows) == 3  # badrow dropped (DROPMALFORMED)


def test_movielens_top_rated_per_year(spark, movielens_files):
    mp, rp, tp = movielens_files
    got = lab.top_rated_movies_per_year(
        read_movies(spark, mp), read_ratings(spark, rp), read_tags(spark, tp), top_n=10
    ).collect()
    by_year = {}
    for r in got:
        by_year.setdefault(r.year, []).append(r)
    y2020 = [(r.rank, r.movieId, r.avg_rating, r.n_tags) for r in by_year[2020]]
    assert y2020 == [(1, 1, 4.5, 2), (2, 2, 3.0, 0)]  # movie 2: no tags -> 0
    y2021 = [(r.rank, r.movieId, r.avg_rating, r.n_tags) for r in by_year[2021]]
    assert y2021 == [(1, 3, 4.5, 1), (2, 2, 2.5, 0)]


def test_tweets_dsv_header_filter(spark, tmp_path):
    p = tmp_path / "tweet.dsv"
    p.write_text(
        "LANGUAGE|CONTENT|TW_HASHTAGS|SENTIMENT|CITY|COUNTY|STATE|COUNTRY|CONT|NAME|GENDER\n"
        "it|ciao mondo|#vaccino,#salute|1|Roma|RM|Lazio|Italy|EU|a|male\n"
        "en|hello|#covid|-1|0|x|y|USA|NA|b|female\n"
    )
    tw = read_tweets(spark, str(p))
    rows = tw.collect()
    assert len(rows) == 2  # header row filtered by value
    assert rows[0].tw_hashtags == "#vaccino#salute"  # commas stripped
    assert rows[1].city == "0"


def test_weather_parse_garbage_lines_dont_abort(spark, tmp_path):
    """Spark 4 ANSI casts abort on malformed input; the fixed-width
    adapter must instead yield NULL/invalid rows (try_cast policy)."""
    p = tmp_path / "garbage.txt"
    p.write_text("garbage\n" + " " * 93 + "\n")
    rows = read_weather(spark, str(p)).collect()
    assert len(rows) == 2
    assert all(r.temperature is None and not r.validTemperature for r in rows)


def test_transactions_avg_price(spark, tmp_path):
    """303 real-estate: header + ';' delimiter CSV (S8), x1.2 avg desc."""
    from bigdatalab_spark.sources.readers import read_csv

    p = tmp_path / "realestate.txt"
    p.write_text(
        "street;city;zip;state;beds;baths;sq__ft;type;sale_date;price;latitude;longitude\n"
        "a st;ROMA;1;RM;2;1;100;Res;x;100000;0;0\n"
        "b st;ROMA;1;RM;3;2;150;Res;x;200000;0;0\n"
        "c st;MILANO;2;MI;2;1;90;Res;x;300000;0;0\n"
    )
    tx = read_csv(spark, str(p), header=True, sep=";", infer_schema=True)
    got = lab.transactions_avg_price_per_city(tx).collect()
    assert [(r.city, r.avgPrice) for r in got] == [
        ("MILANO", 360000.0),
        ("ROMA", 180000.0),
    ]


def test_gender_pay_gap(spark):
    """303 pay gap: avg per (country,gender), join, expr gap column."""
    rows = [
        ("Alice", "Female", "IT", 100.0),
        ("Bea", "Female", "IT", 200.0),
        ("Carl", "Male", "IT", 100.0),
        ("Dora", "Female", "FR", 300.0),
        ("Ed", "Male", "FR", 400.0),
    ]
    df = spark.createDataFrame(
        rows, "first_name string, gender string, country string, salary double"
    )
    got = {r.country: r for r in lab.gender_pay_gap(df).collect()}
    assert got["IT"].gap == pytest.approx(50.0)   # 150 - 100
    assert got["FR"].gap == pytest.approx(-100.0)  # 300 - 400


def test_population_explicit_schema_all_strings(spark, tmp_path):
    """303 explicit-StructType exercise (S7): every column read as
    StringType regardless of content."""
    from bigdatalab_spark.sources.readers import read_csv
    from bigdatalab_spark.sources.schemas import POPULATION_SCHEMA

    p = tmp_path / "population.csv"
    p.write_text("00601;18570;41.5;9078;9492\n00602;41520;42.1;20396;21124\n")
    pop = read_csv(spark, str(p), header=False, sep=";", schema=POPULATION_SCHEMA)
    assert [f.dataType.simpleString() for f in pop.schema.fields] == ["string"] * 5
    rows = pop.collect()
    assert rows[0].zipcode == "00601" and rows[0].avg_age == "41.5"


def test_python_datasource_fixedwidth_matches_codegen_adapter(spark, tmp_path):
    """The Spark-4 Python DataSource ('fixedwidth') and the codegen
    substring adapter parse the SAME spec to identical rows, including
    the malformed-field -> NULL policy and short-line empty strings;
    a directory input reads with one partition per file."""
    from bigdatalab_spark.sources.pyds import (
        parse_spec_option,
        register_python_sources,
        spec_option,
    )
    from bigdatalab_spark.sources.readers import read_fixed_width
    from bigdatalab_spark.sources.schemas import ISD_WEATHER_SPEC

    # round-trip of the spec serialization
    assert parse_spec_option(spec_option(ISD_WEATHER_SPEC)) == ISD_WEATHER_SPEC

    d = tmp_path / "isd"
    d.mkdir()
    lines_a = [
        _isd_line("010010", "99999", "2020", "01", "01", 26),
        _isd_line("020020", "99999", "2020", "02", "02", 9999),
    ]
    # a malformed short line and a garbage-temp line
    lines_b = [
        _isd_line("030030", "11111", "2021", "03", "01", 200),
        "too short",
        _isd_line("040040", "22222", "2021", "04", "01", 0).replace("+0000", "abcde"),
    ]
    (d / "part-a.txt").write_text("\n".join(lines_a) + "\n")
    (d / "part-b.txt").write_text("\n".join(lines_b) + "\n")

    register_python_sources(spark)
    pyds = (
        spark.read.format("fixedwidth")
        .option("spec", spec_option(ISD_WEATHER_SPEC))
        .load(str(d))
    )
    jvm = read_fixed_width(spark, str(d), ISD_WEATHER_SPEC)
    assert pyds.schema == jvm.schema
    key = lambda r: tuple("" if v is None else str(v) for v in r)
    assert sorted(map(key, pyds.collect())) == sorted(map(key, jvm.collect()))
    # file-granular parallelism: two files -> two input partitions
    assert pyds.rdd.getNumPartitions() == 2

    import pytest

    with pytest.raises(Exception):
        spark.read.format("fixedwidth").option("spec", "bogus").load(str(d)).collect()


def test_python_datasource_fixedwidth_writer_roundtrip_and_abort(spark, tmp_path):
    """The write half of the custom connector: task-temp -> job-commit
    protocol (part files + _SUCCESS appear only on commit), append jobs
    don't collide, overwrite clears, and a mid-job failure aborts with
    NO partial output left visible."""
    import pyspark.errors

    import pytest as _pytest

    from bigdatalab_spark.sources.pyds import register_python_sources, spec_option
    from bigdatalab_spark.sources.readers import FixedWidthField

    register_python_sources(spark)
    spec = [
        FixedWidthField("station", 0, 6, "string", None),
        FixedWidthField("temp", 6, 12, "double", 10.0),
        FixedWidthField("n", 12, 18, "bigint", None),
    ]
    opt = spec_option(spec)
    out = str(tmp_path / "fw")

    df = spark.createDataFrame(
        [("ABC", 21.3, 7), ("DEFGHI", -4.5, 123456), ("X", None, None)],
        "station string, temp double, n bigint",
    ).repartition(2)
    df.write.format("fixedwidth").option("spec", opt).mode("overwrite").save(out)
    files = sorted(p.name for p in (tmp_path / "fw").iterdir())
    assert "_SUCCESS" in files and sum(f.startswith("part-") for f in files) == 2

    back = spark.read.format("fixedwidth").option("spec", opt).load(out)
    got = sorted(
        (r["station"].rstrip(), r["temp"], r["n"]) for r in back.collect()
    )
    assert got == [("ABC", 21.3, 7), ("DEFGHI", -4.5, 123456), ("X", None, None)]

    # append must not clobber the first job's part files
    spark.createDataFrame([("NEW", 1.0, 1)], "station string, temp double, n bigint") \
        .coalesce(1).write.format("fixedwidth").option("spec", opt).mode("append").save(out)
    assert spark.read.format("fixedwidth").option("spec", opt).load(out).count() == 4

    # overwrite clears every earlier part file
    df.write.format("fixedwidth").option("spec", opt).mode("overwrite").save(out)
    assert spark.read.format("fixedwidth").option("spec", opt).load(out).count() == 3

    # failed job: the big int can't fit its 6-char slot -> task raises
    # -> abort cleans the temp; the committed output stays as it was
    bad = spark.createDataFrame(
        [("OK", 0.0, 1), ("BAD", 0.0, 10**12)], "station string, temp double, n bigint"
    )
    with _pytest.raises(pyspark.errors.PySparkException):
        bad.write.format("fixedwidth").option("spec", opt).mode("append").save(out)
    # the durable contract: NO partial data visible — the committed
    # dataset reads back unchanged and no new part files appeared.
    # (_tmp orphans from tasks killed mid-write are possible and
    # reader-invisible by the underscore convention; cleanup is
    # best-effort, so poll briefly rather than assert instantly.)
    files = sorted(p.name for p in (tmp_path / "fw").iterdir())
    assert sum(f.startswith("part-") for f in files) == 2, files
    assert spark.read.format("fixedwidth").option("spec", opt).load(out).count() == 3
    import time as _time

    for _ in range(20):
        orphans = [
            p.name for p in (tmp_path / "fw").iterdir() if p.name.startswith("_tmp-")
        ]
        if not orphans:
            break
        _time.sleep(0.25)


def test_bitmap_preaggregate_or_merges_across_days(spark, sf_dir):
    """bitmap_distinct_users' docstring claims the bucket bitmaps are a
    PERSISTABLE pre-aggregate: daily bitmaps OR-merge into the exact
    monthly distinct without touching raw ids again. Prove it: build
    per-(day, bucket) bitmaps, bitmap_or_agg them per bucket, sum the
    popcounts — equals count(DISTINCT user_id) over the whole table."""
    from bigdatalab_spark.sources import load_table

    ev = load_table(spark, str(sf_dir), "events")
    ev.createOrReplaceTempView("ev_bm")
    merged = spark.sql(
        """
        SELECT sum(bitmap_count(bm)) AS n
        FROM (
            SELECT bucket, bitmap_or_agg(day_bm) AS bm
            FROM (
                SELECT to_date(ts) AS day,
                       bitmap_bucket_number(user_id) AS bucket,
                       bitmap_construct_agg(bitmap_bit_position(user_id))
                           AS day_bm
                FROM ev_bm
                GROUP BY to_date(ts), bitmap_bucket_number(user_id)
            )
            GROUP BY bucket
        )
        """
    ).collect()[0]["n"]
    exact = ev.selectExpr("count(DISTINCT user_id) AS n").collect()[0]["n"]
    assert merged == exact


def test_fixedwidth_stream_reader_single_file_relative_path(tmp_path, monkeypatch):
    """Single-file mode path reconstruction: _listing returns the
    BASENAME so partitions() can rejoin it onto dirname(path) — a
    relative file path used to become dir/dir/file and read() opened a
    nonexistent path. Driver-side unit test, no query needed."""
    from bigdatalab_spark.sources.pyds import FixedWidthStreamReader, spec_option
    from bigdatalab_spark.sources.readers import FixedWidthField

    spec = [
        FixedWidthField("station", 0, 6, "string", None),
        FixedWidthField("temp", 6, 12, "double", 10.0),
    ]
    d = tmp_path / "one"
    d.mkdir()
    (d / "data.txt").write_text("AAA   " + "15".rjust(6) + "\n")

    monkeypatch.chdir(tmp_path)
    for path in ("one/data.txt", str(d / "data.txt")):  # relative + absolute
        r = FixedWidthStreamReader({"path": path, "spec": spec_option(spec)})
        assert r._listing() == ["data.txt"]
        parts = r.partitions(r.initialOffset(), r.latestOffset())
        assert len(parts) == 1
        rows = [(st.rstrip(), t) for st, t in r.read(parts[0])]
        assert rows == [("AAA", 1.5)], (path, rows)


def test_python_datasource_fixedwidth_streams_with_exactly_once_restart(
    spark, tmp_path
):
    """Streaming half of the custom connector (DataSourceStreamReader):
    files tail in name order with one input partition per new file;
    a checkpoint restart re-reads ONLY its uncommitted range (a file
    arriving between stop and restart is delivered exactly once,
    certified end-to-end by the file sink's transaction log)."""
    import time

    from bigdatalab_spark.sources.pyds import register_python_sources, spec_option
    from bigdatalab_spark.sources.readers import FixedWidthField

    register_python_sources(spark)
    spec = [
        FixedWidthField("station", 0, 6, "string", None),
        FixedWidthField("temp", 6, 12, "double", 10.0),
    ]
    opt = spec_option(spec)
    d = tmp_path / "tail"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def fw_line(st: str, t: float) -> str:
        return st.ljust(6) + str(int(t * 10)).rjust(6)

    (d / "f-001.txt").write_text(fw_line("AAA", 1.5) + "\n" + fw_line("BBB", 2.0) + "\n")
    (d / "f-002.txt").write_text(fw_line("CCC", -3.0) + "\n")

    def start():
        return (
            spark.readStream.format("fixedwidth")
            .option("spec", opt)
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def sink_count() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0  # sink dir/metadata not created yet

    def wait_rows(n: int, timeout_s: float = 90.0) -> None:
        t0 = time.time()
        while sink_count() < n:
            assert time.time() - t0 < timeout_s, f"sink stuck at {sink_count()} < {n}"
            time.sleep(0.3)

    q = start()
    try:
        wait_rows(3)
        # a file arriving mid-stream is picked up by a later batch
        (d / "f-003.txt").write_text(fw_line("DDD", 7.5) + "\n")
        wait_rows(4)
    finally:
        q.stop()

    # arrives while the query is DOWN; restart must deliver it once
    (d / "f-004.txt").write_text(fw_line("EEE", 0.1) + "\n")
    q2 = start()
    try:
        wait_rows(5)
        time.sleep(1.0)  # would duplicate now if the restart re-read
        rows = sorted(
            (r.station.rstrip(), r.temp)
            for r in spark.read.parquet(out).collect()
        )
    finally:
        q2.stop()
    assert rows == [
        ("AAA", 1.5), ("BBB", 2.0), ("CCC", -3.0), ("DDD", 7.5), ("EEE", 0.1)
    ]
