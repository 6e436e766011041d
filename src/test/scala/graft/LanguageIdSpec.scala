package graft

import org.apache.spark.sql.functions._

import graft.operators.{LanguageProfiles, TextAnalysis}

/** The 57-language script+trigram classifier (round-10 upgrade of the
  * 4-language stopword toy): correct codes on hand-written sentences per
  * family, agreement with the toy's labels on its own four languages, and
  * the mechanical lookalike guard over the profile data itself.
  */
class LanguageIdSpec extends SparkSpec {
  import spark.implicits._

  private def classify(texts: (Long, String)*): Map[Long, (String, String)] =
    TextAnalysis.languageIdNgram(
        texts.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  test("profile hygiene: every battery word's characters lie inside its script's ranges (lookalike guard)") {
    // catches any Latin i/j slipping into Cyrillic words (U+0456/U+0458
    // lookalikes) or a stray Cyrillic а in a Latin profile
    LanguageProfiles.scripts.filter(_.battery.nonEmpty).foreach { s =>
      val bad = for {
        (lang, grams) <- s.battery
        g <- grams
        ch <- g.toSeq if ch != ' '
        if !s.ranges.exists { case (lo, hi) => ch.toInt >= lo && ch.toInt <= hi }
      } yield (lang, g, ch, f"U+${ch.toInt}%04X")
      assert(bad.isEmpty,
        s"script ${s.name}: out-of-script chars in profiles: ${bad.take(5)}")
    }
    assert(LanguageProfiles.languages.size >= 50,
      s"need >=50 languages, have ${LanguageProfiles.languages.size}")
  }

  test("Latin battery: en/de/es/fr match the stopword toy's labels on its own languages") {
    val texts = Seq(
      1L -> "the cat and the dog went to the market because it was sunny that day",
      2L -> "der hund und die katze sind nicht mit dem zug nach hause gefahren",
      3L -> "el perro y los gatos de la casa que es muy grande para todos ellos",
      4L -> "le chien et les enfants est dans la maison pour une grande fête du village")
    val ngram = classify(texts: _*)
    texts.foreach { case (id, _) =>
      assert(ngram(id)._1 == "latin", s"doc $id script ${ngram(id)}")
    }
    // the toy's own labels on the same sentences
    val toy = texts.toDF("doc_id", "text")
      .select(col("doc_id"), (TextAnalysis.languageId(col("text")): @annotation.nowarn("cat=deprecation")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(toy == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr"))
    assert(ngram.view.mapValues(_._2).toMap ==
      Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr"))
  }

  test("wider Latin battery: it/pt/nl/pl/tr/fi/sw") {
    val got = classify(
      1L -> "il gatto che non sono con una casa per la città più bella",
      2L -> "os cachorros não estão em uma casa para o menino mais velho",
      3L -> "de honden zijn niet met een huis voor het kind op de markt",
      4L -> "w tym roku nie jest tak jak przez ostatnie lata po wojnie się działo",
      5L -> "bu bir ev için çok daha güzel ama her zaman böyle değil",
      6L -> "hän oli mutta se ei ole niin kuin myös sinä olet ollut siellä",
      7L -> "watu wa kijiji katika nchi hii ni kama ndugu kwa sababu ya historia yake")
    assert(got.view.mapValues(_._2).toMap == Map(
      1L -> "it", 2L -> "pt", 3L -> "nl", 4L -> "pl", 5L -> "tr",
      6L -> "fi", 7L -> "sw"), got.toString)
  }

  test("Nordic trio separates on its real discriminators (af/av, efter/etter)") {
    val got = classify(
      1L -> "och det som är en stor dag för de som inte har ett hem men var glada",
      2L -> "og det er ikke en stor dag efter alt der skete af mange grunde for ham",
      3L -> "og det er ikke en stor dag etter alt som skjedde av mange grunner for han")
    assert(got.view.mapValues(_._2).toMap == Map(1L -> "sv", 2L -> "da", 3L -> "no"),
      got.toString)
  }

  test("Cyrillic battery + script-only families + CJK rules") {
    val cyrI = "і"
    val got = classify(
      1L -> "он не знал что это было на самом деле и почему так вышло",
      2L -> s"в${cyrI}н не знав що це було ${cyrI} чому вона п${cyrI}шла в${cyrI}д нього",
      3L -> "това не е как той го прави но ще се видим при него като друг",
      4L -> "τα παιδιά στην ελλάδα μιλούν ελληνικά κάθε μέρα στο σχολείο",
      5L -> "הילדים בישראל מדברים עברית כל יום בבית הספר",
      6L -> "เด็กในประเทศไทยพูดภาษาไทยทุกวันที่โรงเรียน",
      7L -> "中国的孩子每天在学校说中文",
      8L -> "日本の子供たちは毎日学校で日本語を話します",
      9L -> "한국의 아이들은 매일 학교에서 한국어를 말합니다",
      10L -> "बच्चे हर दिन स्कूल में हिंदी बोलते हैं और यह नहीं भी था",
      11L -> "在庫システムと更新された報告書を確認してください なお先生がカタカナで書いた",
      12L -> "")
    assert(got(1L)._2 == "ru", got(1L).toString)
    assert(got(2L)._2 == "uk", got(2L).toString)
    assert(got(3L)._2 == "bg", got(3L).toString)
    assert(got(4L) == ("greek", "el"))
    assert(got(5L) == ("hebrew", "he"))
    assert(got(6L) == ("thai", "th"))
    assert(got(7L) == ("han", "zh"))
    assert(got(8L)._2 == "ja")
    assert(got(9L) == ("hangul", "ko"))
    assert(got(10L) == ("devanagari", "hi"))
    // kanji-majority text with ANY kana present is Japanese, not Chinese
    assert(got(11L)._2 == "ja", got(11L).toString)
    assert(got(12L) == ("none", "und"))
  }

  test("Arabic-script battery separates ar from fa/ur by their extra letters") {
    val got = classify(
      1L -> "هذا هو الكتاب الذي كان في البيت من قبل وهو على الطاولة الآن",
      2L -> "این کتاب است که در خانه بود و برای شما با خود آورده است",
      3L -> "یہ وہ کتاب ہے جو گھر میں تھی اور آپ کے لیے لائی گئی ہے")
    assert(got(1L)._2 == "ar", got(1L).toString)
    assert(got(2L)._2 == "fa", got(2L).toString)
    assert(got(3L)._2 == "ur", got(3L).toString)
  }

  test("numbers-and-punctuation-only text is und; Latin text with no battery hits is und; null text is und") {
    val got = classify(1L -> "12345 !!! ??? 678", 2L -> "zzzz qqqq xxxx")
    assert(got(1L) == ("none", "und"))
    assert(got(2L) == ("latin", "und"))
    val withNull = TextAnalysis.languageIdNgram(
        spark.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(9L, null)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))),
        col("doc_id"), col("text"))
      .collect().head
    assert((withNull.getString(1), withNull.getString(2)) == ("none", "und"))
  }

  test("language ID runs on a stream statelessly, identical to the batch path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "the cat and the dog went to the market because it was sunny"),
      (2L, "der hund und die katze sind nicht mit dem zug gefahren"),
      (3L, "он не знал что это было на самом деле и почему"),
      (4L, "日本の子供たちは毎日学校で日本語を話します"))
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.languageIdNgram(
        in.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("lang_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "languageIdNgram must run without a stateful operator")
      val streamed = spark.table("lang_sink").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      val batch = classify(rows: _*)
      assert(streamed == batch, s"$streamed\nvs\n$batch")
    } finally {
      q.stop()
      spark.catalog.dropTempView("lang_sink")
    }
  }

  test("single-pass codepoint counter == the 25 regex-strip counts the oracle replays (random mixed-script text)") {
    import graft.functions.GraftFunctions
    val pool = ("abcdefgh äöüßñç φλεω икифы الערב हिनदी 中文字漢 ひらカタ 한국어 ไทยลาว " +
      "ქართული հայերեն தமிழ் තෙලుగు 0123 !?.,🙂𝄞").toCharArray
    val rnd = new scala.util.Random(7)
    val texts = (1L to 25L).map { i =>
      // build from raw chars so surrogate halves can ONLY pair correctly
      // when adjacent picks happen to align — exercising codePointAt
      (i, String.valueOf(Array.fill(80)(pool(rnd.nextInt(pool.length)))))
    }
    val df = texts.toDF("doc_id", "text")
    val scripts = LanguageProfiles.scripts
    val viaExpr = df.select(col("doc_id"),
      GraftFunctions.codepointRangeCounts(
        col("text"), TextAnalysis.scriptRangeTable).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaRegex = df.select(col("doc_id") +:
        scripts.map(s => (length(col("text")) - length(regexp_replace(
          col("text"), LanguageProfiles.javaCharClass(s), ""))).as(s.name)): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to scripts.size).map(r.getInt)).toMap
    texts.foreach { case (id, _) =>
      assert(viaExpr(id) == viaRegex(id), s"doc $id: ${viaExpr(id)} vs ${viaRegex(id)}")
    }
  }
}
