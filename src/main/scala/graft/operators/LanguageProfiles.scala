package graft.operators

/** Static language-identification profiles: unicode-script ranges plus
  * per-language character-trigram sets derived from each language's most
  * common function words (public knowledge — the same word inventories any
  * frequency list of the language opens with).
  *
  * Two-tier design (the classic trigram-profile method, Cavnar & Trenkle
  * 1994, composed with script detection as CLD-family identifiers do):
  * script membership alone decides ~20 languages whose script is
  * one-language (Greek→el, Thai→th, …) and the CJK trio (kana⇒ja,
  * hangul⇒ko, han-without-kana⇒zh); the four multi-language scripts
  * (Latin, Cyrillic, Arabic, Devanagari) fall through to a trigram-set
  * intersection battery over that script's candidate languages only.
  *
  * Everything here is a PLAN LITERAL — profiles ride the query plan as
  * small array literals (the whole table is ~3 k trigrams), so scoring is
  * a zero-shuffle projection and the DuckDB oracle replays the identical
  * arithmetic from the same rendered literals.
  *
  * Lookalike discipline: Cyrillic і (U+0456) and ј (U+0458) are visually
  * identical to Latin i/j, so they are spelled as escapes and ONLY via
  * the constants below; `LanguageIdSpec` asserts every profile word's
  * characters fall inside its script's ranges, which catches any
  * lookalike slip mechanically.
  */
object LanguageProfiles {

  /** Cyrillic letters with ASCII lookalikes — always via these constants. */
  private val cyrI = "і" // CYRILLIC SMALL LETTER BYELORUSSIAN-UKRAINIAN I
  private val cyrJe = "ј" // CYRILLIC SMALL LETTER JE

  /** A detected script: codepoint ranges (inclusive, lowercase forms are
    * what matters — text is lowercased first), the trigram battery over
    * its candidate languages (empty = script alone decides), and the
    * language the script resolves to when the battery has no hits (for
    * single-language scripts: the language itself).
    */
  final case class Script(
      name: String,
      ranges: Seq[(Int, Int)],
      battery: Seq[(String, Seq[String])],
      default: String)

  private def trigramsOf(words: Seq[String]): Seq[String] =
    words.flatMap { w =>
      val p = s" $w "
      (0 to p.length - 3).map(i => p.substring(i, i + 3))
    }.distinct

  private def battery(entries: (String, Seq[String])*): Seq[(String, Seq[String])] =
    entries.map { case (lang, words) => lang -> trigramsOf(words) }
      .sortBy(_._1)

  /** Latin battery: 28 languages, ~20 top function words each. */
  private val latinBattery = battery(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "that", "for",
      "it", "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
      "eine", "als", "auch"),
    "es" -> Seq("de", "la", "que", "el", "en", "los", "del", "se", "las",
      "por", "un", "para", "con", "no", "una", "su", "al", "es", "lo", "como"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "par", "plus", "pas",
      "au", "sur"),
    "it" -> Seq("di", "il", "la", "che", "in", "un", "per", "non", "una",
      "sono", "con", "si", "da", "come", "le", "dei", "del", "più", "anche",
      "questo"),
    "pt" -> Seq("de", "que", "do", "da", "em", "um", "para", "com", "não",
      "uma", "os", "no", "se", "na", "por", "mais", "as", "dos", "ao",
      "como"),
    "nl" -> Seq("de", "van", "het", "een", "en", "in", "is", "dat", "op",
      "te", "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als",
      "bij"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av", "för",
      "med", "till", "den", "har", "de", "inte", "om", "ett", "men", "var",
      "från"),
    "da" -> Seq("og", "at", "det", "er", "en", "til", "på", "de", "med",
      "han", "af", "for", "ikke", "der", "var", "som", "men", "sig", "har",
      "også"),
    "no" -> Seq("og", "det", "på", "som", "er", "en", "til", "han", "av",
      "for", "med", "at", "var", "de", "ikke", "den", "har", "jeg", "om",
      "et"),
    "fi" -> Seq("on", "ja", "ei", "että", "se", "hän", "oli", "mutta",
      "joka", "ovat", "kun", "niin", "kuin", "myös", "sen", "tai", "jos",
      "mitä", "vain", "ole"),
    "pl" -> Seq("w", "i", "na", "z", "do", "że", "nie", "się", "jest",
      "to", "jak", "po", "co", "tak", "ale", "przez", "od", "za", "przy",
      "roku"),
    "cs" -> Seq("je", "v", "na", "se", "že", "s", "z", "do", "k", "o",
      "to", "jako", "za", "by", "podle", "ale", "pro", "jeho", "který",
      "byl"),
    "sk" -> Seq("je", "v", "na", "sa", "že", "s", "z", "do", "k", "o",
      "to", "ako", "za", "by", "podľa", "ale", "pre", "jeho", "ktorý",
      "bol"),
    "hu" -> Seq("az", "és", "hogy", "nem", "is", "egy", "van", "de",
      "volt", "meg", "ez", "már", "csak", "mint", "el", "így", "vagy",
      "ha", "még", "ezt"),
    "ro" -> Seq("de", "și", "în", "la", "cu", "pe", "este", "un", "o",
      "care", "din", "pentru", "mai", "se", "nu", "sau", "dar", "fi",
      "după", "fost"),
    "tr" -> Seq("bir", "ve", "bu", "için", "de", "da", "ile", "olarak",
      "çok", "daha", "en", "gibi", "kadar", "sonra", "ama", "her", "ne",
      "olan", "ise", "değil"),
    "vi" -> Seq("của", "và", "các", "có", "trong", "được", "là", "cho",
      "không", "người", "những", "với", "này", "đã", "khi", "về", "một",
      "để", "trên", "cũng"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
      "ini", "dari", "dalam", "akan", "pada", "juga", "ke", "karena",
      "ada", "mereka", "sudah", "atau", "bisa"),
    "ca" -> Seq("de", "la", "que", "el", "i", "a", "en", "per", "amb",
      "els", "les", "un", "una", "al", "del", "no", "es", "més", "com",
      "dels"),
    "hr" -> Seq("je", "i", "u", "na", "se", "da", "su", "za", "od", "s",
      "koji", "što", "ali", "iz", "o", "kao", "do", "će", "bio", "ili"),
    "sl" -> Seq("je", "in", "v", "na", "se", "da", "so", "za", "od", "z",
      "ki", "kot", "tudi", "pa", "bi", "po", "še", "le", "bil", "ali"),
    "et" -> Seq("on", "ja", "ei", "et", "ta", "oli", "ka", "see", "kui",
      "aga", "oma", "mis", "või", "siis", "nagu", "veel", "juba", "kes",
      "üle", "välja"),
    "lv" -> Seq("un", "ir", "ka", "par", "ar", "no", "uz", "kas", "bet",
      "tika", "viņš", "arī", "tik", "jau", "pēc", "vai", "tās", "šo",
      "kā", "lai"),
    "lt" -> Seq("ir", "yra", "kad", "su", "tai", "bet", "iš", "buvo",
      "kaip", "jis", "apie", "į", "dėl", "prie", "tik", "jau", "dar",
      "ar", "po", "taip"),
    "sq" -> Seq("të", "dhe", "në", "e", "një", "për", "me", "nga", "që",
      "ka", "si", "u", "po", "është", "do", "ai", "kjo", "më", "se",
      "duke"),
    "sw" -> Seq("ya", "wa", "na", "kwa", "ni", "katika", "za", "la",
      "hii", "kama", "lakini", "pia", "hata", "yake", "watu", "kuwa",
      "sana", "baada", "bila", "wake"),
    "eu" -> Seq("eta", "da", "ez", "bat", "du", "ere", "zen", "baina",
      "dira", "hori", "izan", "egin", "bere", "dute", "hau", "gabe",
      "oso", "baino", "zuen", "dela"))

  /** Cyrillic battery: ru/uk/bg/sr/kk. Ukrainian and Kazakh і and Serbian
    * ј are the U+0456/U+0458 constants (never Latin lookalikes).
    */
  private val cyrillicBattery = battery(
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "он", "как", "это",
      "по", "но", "его", "из", "у", "за", "то", "же", "от", "бы", "о"),
    "uk" -> Seq("що", "не", "на", "в" + cyrI + "н", "це", "до", "але",
      "його", "в" + cyrI + "д", "за", "як", "у", "з", "та", cyrI, "про",
      "був", "вона", "щоб", "також"),
    "bg" -> Seq("и", "в", "не", "на", "че", "с", "той", "как", "това",
      "по", "но", "него", "от", "за", "да", "се", "са", "ще", "при",
      "като"),
    "sr" -> Seq(cyrJe + "е", "и", "у", "не", "на", "што", "са", "он",
      "као", "то", "по", "али", "га", "из", "за", "да", "се", "су",
      "ко" + cyrJe + "и", "б" + cyrJe),
    "kk" -> Seq("және", "бұл", "б" + cyrI + "р", "үш" + cyrI + "н",
      "мен", "бар", "деп", "болып", "керек", "да", "оның", "сол", "өз",
      "ед" + cyrI, "жоқ", "туралы", "кей" + cyrI + "н", "дей" + cyrI + "н",
      "арқылы", "сияқты"))

  /** Arabic-script battery: ar/fa/ur (fa/ur carry their extra letters —
    * گ چ پ ژ / ے ٹ ڈ ہ — inside common words, which is what separates
    * them from ar).
    */
  private val arabicBattery = battery(
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "التي",
      "الذي", "مع", "كان", "لم", "ما", "لا", "هو", "أو", "كل", "بعد",
      "قد", "بين"),
    "fa" -> Seq("در", "از", "به", "که", "این", "را", "با", "است",
      "برای", "آن", "یک", "خود", "تا", "بر", "بود", "شده", "هم", "می",
      "ما", "اگر"),
    "ur" -> Seq("میں", "کے", "کی", "سے", "کو", "پر", "کہ", "ہے", "اور",
      "ایک", "نے", "بھی", "تھا", "ہیں", "لیے", "گیا", "کر", "جو",
      "نہیں", "وہ"))

  /** Devanagari battery: hi/mr/ne. */
  private val devanagariBattery = battery(
    "hi" -> Seq("के", "में", "की", "है", "को", "से", "का", "पर", "यह",
      "और", "ने", "कि", "हैं", "था", "एक", "नहीं", "भी", "कर", "वह",
      "हो"),
    "mr" -> Seq("आहे", "आणि", "या", "च्या", "मध्ये", "ते", "व", "ही",
      "तो", "केली", "झाले", "होते", "आला", "त्या", "असून", "केला", "हे",
      "नाही", "काही", "आहेत"),
    "ne" -> Seq("छ", "र", "को", "मा", "का", "ले", "भएको", "गरेको",
      "लागि", "पनि", "छन्", "हुने", "गर्न", "भने", "यो", "त्यो", "नै",
      "हो", "थियो", "गरी"))

  /** Every detected script. Order is the tie-break order only insofar as
    * names differ; dominance is (count, name) max, deterministic in both
    * engines. `kana` beats `han` by the Japanese rule applied AFTER
    * dominance (any kana present + han dominant ⇒ ja).
    */
  val scripts: Seq[Script] = Seq(
    Script("latin",
      Seq((0x61, 0x7A), (0xDF, 0xF6), (0xF8, 0x24F), (0x1E00, 0x1EFF)),
      latinBattery, "und"),
    Script("cyrillic", Seq((0x400, 0x4FF)), cyrillicBattery, "ru"),
    Script("arabic", Seq((0x600, 0x6FF)), arabicBattery, "ar"),
    Script("devanagari", Seq((0x900, 0x97F)), devanagariBattery, "hi"),
    Script("han", Seq((0x4E00, 0x9FFF)), Nil, "zh"),
    Script("kana", Seq((0x3040, 0x30FF)), Nil, "ja"),
    Script("hangul", Seq((0xAC00, 0xD7AF), (0x1100, 0x11FF)), Nil, "ko"),
    Script("greek", Seq((0x370, 0x3FF)), Nil, "el"),
    Script("hebrew", Seq((0x590, 0x5FF)), Nil, "he"),
    Script("thai", Seq((0xE00, 0xE7F)), Nil, "th"),
    Script("lao", Seq((0xE80, 0xEFF)), Nil, "lo"),
    Script("georgian", Seq((0x10A0, 0x10FF)), Nil, "ka"),
    Script("armenian", Seq((0x530, 0x58F)), Nil, "hy"),
    Script("bengali", Seq((0x980, 0x9FF)), Nil, "bn"),
    Script("gurmukhi", Seq((0xA00, 0xA7F)), Nil, "pa"),
    Script("gujarati", Seq((0xA80, 0xAFF)), Nil, "gu"),
    Script("odia", Seq((0xB00, 0xB7F)), Nil, "or"),
    Script("tamil", Seq((0xB80, 0xBFF)), Nil, "ta"),
    Script("telugu", Seq((0xC00, 0xC7F)), Nil, "te"),
    Script("kannada", Seq((0xC80, 0xCFF)), Nil, "kn"),
    Script("malayalam", Seq((0xD00, 0xD7F)), Nil, "ml"),
    Script("sinhala", Seq((0xD80, 0xDFF)), Nil, "si"),
    Script("myanmar", Seq((0x1000, 0x109F)), Nil, "my"),
    Script("khmer", Seq((0x1780, 0x17FF)), Nil, "km"),
    Script("ethiopic", Seq((0x1200, 0x137F)), Nil, "am"))

  /** Total languages the classifier can emit (57 + "und"). */
  def languages: Seq[String] =
    (scripts.flatMap(_.battery.map(_._1)) ++
      scripts.filter(_.battery.isEmpty).map(_.default)).distinct.sorted

  /** Java-regex character class matching `s`'s ranges (the Spark side). */
  def javaCharClass(s: Script): String =
    s.ranges.map { case (lo, hi) => f"\\u$lo%04x-\\u$hi%04x" }
      .mkString("[", "", "]")

  /** RE2 character class for the same ranges (the DuckDB oracle side). */
  def re2CharClass(s: Script): String =
    s.ranges.map { case (lo, hi) => f"\\x{$lo%04x}-\\x{$hi%04x}" }
      .mkString("[", "", "]")
}
