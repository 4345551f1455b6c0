package graft.core

/** Prompt-wrap templates — part of the reference's observable output,
  * copied verbatim (reference reader.py:786-810 `create_wrapper` /
  * `create_chunk_wrapper`, plus the per-source template literals in the
  * `read` dispatcher reader.py:812-1032).
  */
object Wrap {

  /** `create_wrapper` (reader.py:786-797): formatted header, fenced
    * content, trailing blank line.
    */
  def wrapContent(template: String, spec: String, content: String): String = {
    val header = PyText.pyFormat(template, spec)
    (header +: "```" +: PyText.splitLines(content).toVector :+ "```" :+ "")
      .mkString("\n")
  }

  /** `create_chunk_wrapper` (reader.py:799-810): header carries the
    * 0-based line range of the chunk.
    */
  def wrapChunk(template: String, spec: String, start: Int, end: Int,
                content: String): String = {
    val header = PyText.pyFormat(template, spec, start, end)
    (header +: "```" +: PyText.splitLines(content).toVector :+ "```" :+ "")
      .mkString("\n")
  }

  // Template literals, verbatim from the reference dispatcher.
  val File = "Here is the contents of file `{}`:"
  val FileChunk = "Here is the contents of file {} (lines {}-{}):"
  val Url = "Here is the contents of URL {}:"
  val UrlChunk = "Here is the contents of URL {} (lines {}-{}):"
  val UrlBacktick = "Here is the contents from URL `{}`:"
  val UrlBacktickChunk = "Here is the contents from URL `{}` (lines {}-{}):"
  val Archwiki = "Here is the Arch Wiki about `{}`:"
  val ArchwikiChunk = "Here is the Arch Wiki about {} (lines {}-{}):"
  val Bts = "Here is the Debian Bug Tracking System page of {}:"
  val BtsChunk = "Here is the Debian BTS status of {} (lines {}-{}):"
  val Buildd = "Here is the buildd status of package `{}`:"
  val BuilddChunk = "Here is the buildd status of package {} (lines {}-{}):"
  val Cmd = "Here is the output of command `{}`:"
  val CmdChunk = "Here is the output of command {} (lines {}-{}):"
  val Man = "Here is the manual page of {}:"
  val ManChunk = "Here is the manual page of {} (lines {}-{}):"
  val PolicySection = "Here is the Debian Policy document, section {}:"
  val PolicySectionChunk = "Here is the Debian Policy document, section {} (lines {}-{}):"
  val PolicyFull = "Here is the Debian Policy document, {}:"
  val PolicyFullChunk = "Here is the Debian Policy document, {} (lines {}-{}):"
  // Scan ("policy:" with empty spec) uses the reference's comma-less
  // template (reader.py:992-995) — a wording quirk preserved verbatim.
  val PolicyScan = "Here is the Debian Policy document {}:"
  val PolicyScanChunk = "Here is the Debian Policy document {} (lines {}-{}):"
  // Devref wording is distinct from policy (reader.py:916-937): same
  // structure, "Debian Developer Reference document", and section
  // entries are labeled "... document [x]", not "... section [x]".
  val DevrefSection = "Here is the Debian Developer Reference document, section {}:"
  val DevrefSectionChunk = "Here is the Debian Developer Reference document, section {} (lines {}-{}):"
  val DevrefFull = "Here is the Debian Developer Reference document, {}:"
  val DevrefFullChunk = "Here is the Debian Developer Reference document, {} (lines {}-{}):"
  val DevrefScan = "Here is the Debian Developer Reference document {}:"
  val DevrefScanChunk = "Here is the Debian Developer Reference document {} (lines {}-{}):"
  // The reference's nm: branch passes `lambda x: x` as the chunk
  // wrapper (reader.py:880), which would crash chunk_entry's 3-arg
  // call — a latent bug (SURVEY §7.4.3). We reproduce behavior for
  // valid inputs: the question template serves as the chunk template
  // (extra format args are ignored, matching Python's str.format).
  val Nm = "Here is the question {} from Debian nm-templates:"
  val Stdin = "Carefully read the following contents {}:"
  val StdinChunk = "Carefully read the following contents {} (lines {}-{}):"
  val Sbuild = "Here is the sbuild buildlog {}:"
  val SbuildChunk = "Here is the sbuild buildlog {} (lines {}-{}):"
  val Tldr = "Here is the tldr of {}:"
  val TldrChunk = "Here is the tldr of {} (lines {}-{}):"
}
