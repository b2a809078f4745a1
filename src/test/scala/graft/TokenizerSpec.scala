package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tokenize.{CharFold, Tokenizer}

/** Golden tests for the reference tokenizer semantics
  * (reference: app/Helper/Helper.cpp:27-74, app/Indexer/Indexer.cpp:59-91). */
class TokenizerSpec extends AnyFunSuite {

  test("char fold: a-z kept, A-Z lowered, other ASCII is separator") {
    assert(CharFold.fold('a') == 'a' && CharFold.fold('z') == 'z')
    assert(CharFold.fold('A') == 'a' && CharFold.fold('Z') == 'z')
    for (c <- "0123456789 .,!?-_\"'()[]/\\\n\t")
      assert(CharFold.fold(c) == '!', s"char '$c'")
  }

  test("char fold: accent map folds, other non-ASCII is separator") {
    assert(CharFold.fold('ä') == 'a' && CharFold.fold('Ä') == 'a')
    assert(CharFold.fold('ß') == 's' && CharFold.fold('ç') == 'c')
    assert(CharFold.fold('Ÿ') == 'y' && CharFold.fold('ñ') == 'n')
    assert(CharFold.fold('€') == '!' && CharFold.fold('中') == '!')
    assert(CharFold.fold(' ') == '!')
  }

  test("interior tokens kept iff 5..14 chars") {
    // 'word' (4) interior → dropped; 'hello' (5) kept; 14-char kept; 15 dropped
    val t = Tokenizer.tokens("word hello abcdefghijklmn abcdefghijklmno end!")
    assert(t == Seq("hello", "abcdefghijklmn"))
  }

  test("final token kept iff 4..19 chars") {
    assert(Tokenizer.tokens("hello word") == Seq("hello", "word"))
    assert(Tokenizer.tokens("hello abc") == Seq("hello"))
    assert(Tokenizer.tokens("hello " + "a" * 19) == Seq("hello", "a" * 19))
    assert(Tokenizer.tokens("hello " + "a" * 20) == Seq("hello"))
    // trailing separator means the last word is interior-ruled
    assert(Tokenizer.tokens("hello word ") == Seq("hello"))
  }

  test("case folding and accents inside words") {
    assert(Tokenizer.tokens("Hello WORLD") == Seq("hello", "world"))
    // 'Äpfel' folds to 'apfel' (5 chars, kept); 'naïve' → 'naive'
    assert(Tokenizer.tokens("Äpfel naïve") == Seq("apfel", "naive"))
    // FAÇADE → facade
    assert(Tokenizer.tokens("FAÇADE x") == Seq("facade"))
  }

  test("digits and punctuation separate") {
    // 'abc'(3) dropped at the digit separator; 'defgh' is the final token
    assert(Tokenizer.tokens("abc123defgh") == Seq("defgh"))
    assert(Tokenizer.tokens("foo-bar!?") == Seq())
    assert(Tokenizer.tokens("12345") == Seq())
  }

  test("empty and whitespace-only") {
    assert(Tokenizer.tokens("") == Seq())
    assert(Tokenizer.tokens("   \t  ") == Seq())
    assert(Tokenizer.tokens(null) == Seq())
  }

  test("FileEnd marker: finalizes the pending token with the 4..19 rule") {
    val M = Tokenizer.FileEnd.toString
    // body-final 'word' (4) keeps its end-of-file rule despite the appended
    // filename stream; filename interior 'guide' (5..14) kept; trailing
    // 'txt' (3) dropped by the filename's own final rule
    assert(Tokenizer.tokens(s"hello word${M}guide.txt") ==
      Seq("hello", "word", "guide"))
    // body-final token of 16 chars: final rule keeps it, interior would not
    assert(Tokenizer.tokens(s"${"a" * 16}${M}alpha.txt") ==
      Seq("a" * 16, "alpha"))
    // marker with empty pending token is a no-op separator
    assert(Tokenizer.tokens(s"hello ${M}alpha.txt") == Seq("hello", "alpha"))
    // stats: filename occurrences add tf/dl like body occurrences
    val st = Tokenizer.stats(s"guide words here${M}guide.txt")
    assert(st.tf("guide") == 2 && st.dl == 4 && st.wordCount == 3)
  }

  test("tf and stats") {
    val st = Tokenizer.stats("hello world hello there worlds")
    assert(st.tf("hello") == 2)
    assert(st.dl == 5)
    assert(st.wordCount == 4)
  }
}
